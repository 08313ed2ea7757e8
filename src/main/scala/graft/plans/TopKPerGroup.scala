package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Logical per-group top-k: for each distinct value of `partitionSpec`,
  * keep the first `k` rows under `orderSpec` and emit them with their
  * 1-based rank appended as `rankAttr` (IntegerType, same attribute the
  * rewritten `row_number()` window expression produced, so downstream
  * references resolve unchanged).
  *
  * Created only by [[TopKRewriteRule]] during optimization; planned by
  * [[GraftStrategy]] into a partial→shuffle→final bounded-heap pipeline
  * (see [[TopKPerGroupExec]]). Semantics match
  * `Filter(row_number() over (partition, order) <= k)` exactly, including
  * row_number's arbitrary-but-consistent choice among order ties.
  */
/** Which ranking function's filter semantics the operator implements.
  * row_number: arbitrary-but-consistent tie order, exactly k rows per
  * group. rank / dense_rank: ties share a rank, so "rank <= k" may keep
  * more than k rows — the operator must be tie-aware end to end. */
sealed trait RankMode extends Serializable
case object ByRowNumber extends RankMode
case object ByRank extends RankMode
case object ByDenseRank extends RankMode

case class TopKPerGroup(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    mode: RankMode,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"TopKPerGroup needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Optimizer rule: rewrites the standard top-k-per-group idiom
  *
  * {{{ df.withColumn("rk", row_number().over(Window.partitionBy(g).orderBy(o)))
  *     .filter($"rk" <= k) }}}
  *
  * (any Filter whose condition upper-bounds a lone `row_number()` window
  * column, directly or through an integral cast in an intervening
  * Project) into [[TopKPerGroup]]. The built-in plan sorts every group in
  * full (Window requires sorted partitions; InferWindowGroupLimit still
  * sorts, it only drops rows earlier); the native operator keeps a
  * k-bounded heap per group on both the map and reduce side — O(n log k)
  * with no full sort, and the map-side bound caps the shuffle at
  * k rows per group per input partition.
  *
  * The ORIGINAL Filter is kept on top of the rewrite: TopKPerGroup
  * already emits only rows with rank <= k, so the rank predicate becomes
  * a cheap no-op while every residual conjunct (and shapes like
  * `rank = 1`) keeps its exact semantics with no reconstruction logic.
  *
  * Scale guards: k must be <= `spark.graft.topkRewrite.maxK`
  * (default 1000 — the final-side heap holds k rows per group in memory,
  * like Spark's own WindowGroupLimit threshold), and the rewrite can be
  * disabled wholesale with `spark.graft.topkRewrite.enabled=false`.
  */
object TopKRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.topkRewrite.enabled", "true").toBoolean
  private def maxK: Int =
    conf.getConfString("spark.graft.topkRewrite.maxK", "1000").toInt

  /** Casts of the IntegerType rank that are value-preserving: only
    * int→int and the WIDENING int→long. byte/short casts can wrap (or
    * throw under ANSI) past row 127/32767, making `cast(rk) <= k` keep
    * non-prefix ranks the rewrite would drop. */
  private def isWideningIntCast(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.IntegerType || dt == org.apache.spark.sql.types.LongType

  /** True if `dt` contains a float/double anywhere (top level or nested
    * in struct/array/map) — such group keys must keep the Window plan. */
  private def containsFloat(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => true
      case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
      case a: ArrayType => containsFloat(a.elementType)
      case m: MapType => containsFloat(m.keyType) || containsFloat(m.valueType)
      case _ => false
    }
  }

  /** Integral literal value, as Long (rank may be compared as int or as
    * the Long it is commonly cast to). */
  private object IntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _)  => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Long, _)  => Some(v)
      case _ => None
    }
  }

  /** The single ranking window expression of `w`, if that is all `w`
    * computes and the spec is deterministic. Float/double partition
    * keys are declined: Spark's NormalizeFloatingNumbers rule makes
    * -0.0 == 0.0 and NaN == NaN group together for Window nodes, but it
    * does not know TopKPerGroup, whose binary group keys would split
    * them. For rank/dense_rank the same applies to ORDER keys (tie
    * classes are detected by key-byte equality); row_number order keys
    * are fine — ordering comparators already treat floats consistently
    * with SortExec and ties are arbitrary anyway. */
  private def asRankedWindow(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder], RankMode)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(fn, WindowSpecDefinition(part, order, _)), _))
          if order.nonEmpty && order.forall(_.deterministic) && part.forall(_.deterministic) &&
            !part.exists(p => containsFloat(p.dataType)) =>
        val mode = fn match {
          case RowNumber() => Some(ByRowNumber)
          case _: Rank if !order.exists(o => containsFloat(o.child.dataType)) => Some(ByRank)
          case _: DenseRank if !order.exists(o => containsFloat(o.child.dataType)) => Some(ByDenseRank)
          case _ => None
        }
        mode.map(m => (a.toAttribute, part, order, m))
      case _ => None
    }

  /** Attribute ids through which `cond` can see the rank column: the rank
    * attribute itself plus any Project alias of it or of an integral cast
    * of it. */
  private def rankIds(rank: Attribute, projected: Option[Seq[NamedExpression]]): Set[ExprId] = {
    def isRankRef(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rank.exprId
      case c: Cast if isWideningIntCast(c.dataType) => isRankRef(c.child)
      case _ => false
    }
    val viaProject = projected.toSeq.flatten.collect {
      case a @ Alias(e, _) if isRankRef(e) => a.exprId
      case a: Attribute if a.exprId == rank.exprId => a.exprId
    }
    viaProject.toSet + rank.exprId
  }

  /** Smallest upper bound on the rank implied by `cond`, if every
    * rank-referencing conjunct is a recognized bound shape (else the
    * rewrite must not fire — an unrecognized rank predicate could select
    * MORE than a prefix, e.g. `rank > 5`). */
  private def impliedK(cond: Expression, ids: Set[ExprId]): Option[Long] = {
    def onRank(e: Expression): Boolean = e match {
      case a: Attribute => ids.contains(a.exprId)
      case c: Cast if isWideningIntCast(c.dataType) => onRank(c.child)
      case _ => false
    }
    val conjuncts = splitConjunctivePredicates(cond)
    val bounds = conjuncts.filter(_.references.exists(a => ids.contains(a.exprId))).map {
      case LessThanOrEqual(r, IntegralLit(v)) if onRank(r) => Some(v)
      case LessThan(r, IntegralLit(v)) if onRank(r)        => Some(v - 1)
      case GreaterThanOrEqual(IntegralLit(v), r) if onRank(r) => Some(v)
      case GreaterThan(IntegralLit(v), r) if onRank(r)        => Some(v - 1)
      case EqualTo(r, IntegralLit(1)) if onRank(r)            => Some(1L)
      case EqualTo(IntegralLit(1), r) if onRank(r)            => Some(1L)
      case _ => None
    }
    if (bounds.nonEmpty && bounds.forall(_.isDefined)) Some(bounds.flatten.min) else None
  }

  private def rewrite(cond: Expression, w: Window,
                      projected: Option[Seq[NamedExpression]]): Option[TopKPerGroup] =
    asRankedWindow(w).flatMap { case (rank, part, order, mode) =>
      impliedK(cond, rankIds(rank, projected)).collect {
        case k if k >= 1 && k <= maxK =>
          TopKPerGroup(part, order, k.toInt, rank, mode, w.child)
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else {
    plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        rewrite(cond, w, None).map(t => f.copy(child = t)).getOrElse(f)
      case f @ Filter(cond, p @ Project(projList, w: Window)) =>
        rewrite(cond, w, Some(projList))
          .map(t => f.copy(child = p.copy(child = t))).getOrElse(f)
    }
  }
}
