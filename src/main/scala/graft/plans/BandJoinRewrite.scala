package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrites a pure band theta-join
  *
  * {{{ a.join(b, abs(a.t - b.t) <= C && <residual conds>) }}}
  *
  * — which Spark can only plan as a nested-loop / cartesian O(n·m)
  * product — into the bucketized equi-join a scale-safe plan needs:
  * the left side gets bucket key `t div C`, the right side EXPLODES to
  * buckets `{t div C - 1, t div C, t div C + 1}`, and the join becomes
  * a plain hash/sort-merge shuffle on the bucket key with the original
  * band predicate (and all residual conjuncts) kept as the join filter.
  * Every within-band pair shares exactly one bucket pairing (the three
  * exploded buckets are distinct), so no duplicates and no pair lost;
  * per-pair work is bounded by rows-per-2-buckets instead of n·m.
  * This is r44's hand-built strategy (CoverageQueries.scala) promoted
  * to an automatic optimizer rewrite — write the naive join, get the
  * scalable plan.
  *
  * Safety bounds:
  *  - fires only on INNER joins whose condition has NO equi conjunct
  *    (with one, Spark already hash-joins and the band belongs in the
  *    join filter);
  *  - the band columns must be IntegerType/LongType and the width a
  *    positive integral literal. Truncating `div` (vs floor) is still
  *    lossless here: bucket transitions are `C` apart on each side of
  *    zero (the zero bucket is merely wider), so a span of length `C`
  *    crosses at most one transition and band pairs always land in
  *    adjacent-or-equal buckets;
  *  - overflow: the kept band predicate is rebuilt over Long-CAST
  *    operands, so for IntegerType columns every subtraction in the
  *    rewritten plan is exact (|x−y| < 2^33 fits a Long) and agrees
  *    with the bucket arithmetic — the rewrite implements the TRUE band
  *    semantics. The un-rewritten nested loop under non-ANSI Int wrap
  *    would ADDITIONALLY match pairs ~2^32 apart (and under ANSI would
  *    raise); we deliberately do not preserve that wrap artifact. For
  *    LongType columns the "no pair lost" claim holds while true
  *    |x−y| stays below 2^63 − C — operands at opposite Long extremes
  *    are outside the rule's contract (document, don't wrap);
  *  - disable wholesale with `spark.graft.bandJoinRewrite.enabled=false`.
  */
object BandJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.bandJoinRewrite.enabled", "true").toBoolean

  private def isBandType(e: Expression): Boolean =
    e.dataType == IntegerType || e.dataType == LongType

  /** (leftExpr, rightExpr, width, strict) if `e` is `abs(x - y) <= C`
    * (or `< C`, strict) with x/y on opposite sides of the join. */
  private def bandConjunct(e: Expression, left: LogicalPlan,
                           right: LogicalPlan): Option[(Expression, Expression, Long, Boolean)] = {
    def sides(x: Expression, y: Expression, c: Long,
              strict: Boolean): Option[(Expression, Expression, Long, Boolean)] = {
      if (c <= 0 || !isBandType(x) || !isBandType(y)) None
      else if (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet))
        Some((x, y, c, strict))
      else if (y.references.subsetOf(left.outputSet) && x.references.subsetOf(right.outputSet))
        Some((y, x, c, strict))
      else None
    }
    def lit(l: Literal): Option[Long] = l.value match {
      case i: Integer => Some(i.longValue)
      case l2: java.lang.Long => Some(l2.longValue)
      case s: java.lang.Short => Some(s.longValue)
      case _ => None
    }
    e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), l: Literal) =>
        lit(l).flatMap(sides(x, y, _, strict = false))
      case LessThan(Abs(Subtract(x, y, _), _), l: Literal) =>
        lit(l).flatMap(sides(x, y, _, strict = true))
      case GreaterThanOrEqual(l: Literal, Abs(Subtract(x, y, _), _)) =>
        lit(l).flatMap(sides(x, y, _, strict = false))
      case GreaterThan(l: Literal, Abs(Subtract(x, y, _), _)) =>
        lit(l).flatMap(sides(x, y, _, strict = true))
      case _ => None
    }
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression], left: LogicalPlan,
                              right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) => crossSides(l, r, left, right)
      case EqualNullSafe(l, r) => crossSides(l, r, left, right)
      case _ => false
    }

  private def crossSides(l: Expression, r: Expression, left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet) &&
      l.references.nonEmpty && r.references.nonEmpty) ||
      (r.references.subsetOf(left.outputSet) && l.references.subsetOf(right.outputSet) &&
        r.references.nonEmpty && l.references.nonEmpty)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiConjunct(conjuncts, left, right)) j
        else conjuncts.iterator
          .map(e => e -> bandConjunct(e, left, right))
          .collectFirst { case (orig, Some(t)) => (orig, t) } match {
          case None => j
          case Some((orig, (lx, rx, c, strict))) =>
            val width = Literal(c, LongType)
            def bucketOf(e: Expression): Expression =
              IntegralDivide(Cast(e, LongType), width)
            // left: one bucket key, as a projected alias
            val lAlias = Alias(bucketOf(lx), "__graft_band_bk")()
            val newLeft = Project(left.output :+ lAlias, left)
            // right: explode to the three candidate buckets
            val rBk = bucketOf(rx)
            val one = Literal(1L, LongType)
            val arr = CreateArray(Seq(
              Subtract(rBk, one), rBk, Add(rBk, one)))
            val genOut = AttributeReference("__graft_band_bk_r", LongType, nullable = true)()
            val newRight = Generate(Explode(arr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(genOut), child = right)
            // Rebuild the band conjunct over Long-cast operands so the
            // kept filter is exact for Int columns (no non-ANSI wrap, no
            // ANSI overflow error) and consistent with the bucket keys.
            val diff = Abs(Subtract(Cast(lx, LongType), Cast(rx, LongType)))
            val exactBand =
              if (strict) LessThan(diff, width) else LessThanOrEqual(diff, width)
            val kept = conjuncts.map(e => if (e eq orig) exactBand else e).reduce(And)
            val newCond = And(EqualTo(lAlias.toAttribute, genOut), kept)
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }
}
