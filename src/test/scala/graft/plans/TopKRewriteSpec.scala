package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The whole-operator extension path: Filter(row_number <= k) over a
  * Window must be rewritten to the native bounded-heap TopKPerGroup
  * operator — with bit-identical results to the built-in window plan —
  * and must NOT be rewritten for any shape whose semantics the operator
  * does not cover.
  */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus: DataFrame =
    spark.range(0, 2000).select(
      (col("id") % 37).as("g"),
      (col("id") * 48271 % 9973).as("v"),
      col("id"))

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  /** Runs `build` with the rewrite on and off; asserts the on-plan uses
    * the native operator, the off-plan does not, and both agree. */
  private def checkRewritten(build: => DataFrame): Unit = {
    val on = build
    assert(plan(on).contains("TopKPerGroup"), "native operator expected in plan")
    assert(!plan(on).contains("Window"), "window machinery should be gone")
    val expected = withRewriteOff(build.collect().map(_.toString).sorted)
    // note: `build` re-evaluated under the disabled conf inside withRewriteOff
    assert(on.collect().map(_.toString).sorted.sameElements(expected))
  }

  private def withRewriteOff[T](body: => T): T = {
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try body finally spark.conf.unset("spark.graft.topkRewrite.enabled")
  }

  test("per-group top-k via cast alias + filter rewrites and matches the window plan") {
    checkRewritten {
      corpus
        .withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"id")).cast("long"))
        .filter($"rk" <= 5)
    }
  }

  test("direct int rank filter (no cast, no project) rewrites") {
    checkRewritten {
      val w = Window.partitionBy($"g").orderBy($"v", $"id")
      corpus.withColumn("rk", row_number().over(w)).where($"rk" < 4)
    }
  }

  test("keeper selection rank = 1 rewrites to k=1") {
    checkRewritten {
      val w = Window.partitionBy($"g").orderBy($"v", $"id")
      corpus.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    }
  }

  test("global top-k (empty partitionBy) rewrites; single final partition") {
    checkRewritten {
      corpus.withColumn("rk", row_number().over(Window.orderBy($"v".desc, $"id")))
        .filter($"rk" <= 7)
    }
  }

  test("residual conjuncts survive the rewrite") {
    checkRewritten {
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      corpus.withColumn("rk", row_number().over(w))
        .filter($"rk" <= 6 && $"v" % 2 === 0 && $"rk" <= 9)
    }
  }

  test("map-side partial bounds the shuffle input") {
    val df = corpus.repartition(8)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"v".desc, $"id")))
      .filter($"rk" <= 3)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findPartial(p: SparkPlan): Option[TopKPerGroupPartialExec] = p match {
      case t: TopKPerGroupPartialExec => Some(t)
      case a: AdaptiveSparkPlanExec => findPartial(a.executedPlan)
      case q: QueryStageExec => findPartial(q.plan)
      case other => other.children.view.flatMap(findPartial).headOption
    }
    val partial = findPartial(df.queryExecution.executedPlan)
    assert(partial.isDefined, "partial node must be in the executed plan")
    val emitted = partial.get.metrics("numOutputRows").value
    // 37 groups x k=3 x 8 partitions worst case = 888 << 2000 input rows
    assert(emitted <= 37L * 3 * 8, s"partial emitted $emitted rows")
    assert(df.count() == 37L * 3)
  }

  test("rank() filter rewrites tie-aware: all rows of the k-th tie class kept") {
    checkRewritten {
      // v % 7 forces heavy ties inside every group
      val w = Window.partitionBy($"g").orderBy(($"v" % 7).desc)
      corpus.withColumn("rk", rank().over(w)).filter($"rk" <= 3)
    }
  }

  test("dense_rank() filter rewrites tie-aware") {
    checkRewritten {
      val w = Window.partitionBy($"g").orderBy(($"v" % 5).asc, ($"id" % 3).desc)
      corpus.withColumn("rk", dense_rank().over(w)).filter($"rk" <= 2)
    }
  }

  test("rank() = 1 keeps EVERY tied-best row (not just one)") {
    checkRewritten {
      val w = Window.partitionBy($"g").orderBy(($"v" % 2).asc)
      corpus.withColumn("rk", rank().over(w)).filter($"rk" === 1)
    }
  }

  test("rank() with float order keys is NOT rewritten (byte-equality ties unsafe)") {
    val w = Window.partitionBy($"g").orderBy(($"v" % 7).cast("double").desc)
    val df = corpus.withColumn("rk", rank().over(w)).filter($"rk" <= 3)
    assert(!plan(df).contains("TopKPerGroup"))
    // row_number with float order keys still rewrites (ties arbitrary)
    val rn = corpus.withColumn("rk", row_number().over(
      Window.partitionBy($"g").orderBy($"v".cast("double").desc, $"id"))).filter($"rk" <= 3)
    assert(plan(rn).contains("TopKPerGroup"))
  }

  test("lower bounds and unsupported shapes are NOT rewritten") {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val lower = corpus.withColumn("rk", row_number().over(w)).filter($"rk" >= 2)
    assert(!plan(lower).contains("TopKPerGroup"))
    val eqK = corpus.withColumn("rk", row_number().over(w)).filter($"rk" === 3)
    assert(!plan(eqK).contains("TopKPerGroup"))
    val disj = corpus.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3 || $"v" > 100)
    assert(!plan(disj).contains("TopKPerGroup"))
    // correctness of the untouched plans
    assert(eqK.collect().forall(_.getAs[Int]("rk") == 3))
  }

  test("k above the maxK guard keeps the window plan") {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val df = corpus.withColumn("rk", row_number().over(w)).filter($"rk" <= 100000)
    assert(!plan(df).contains("TopKPerGroup"))
  }

  test("multi-window-expression nodes are NOT rewritten") {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val df = corpus
      .withColumn("rk", row_number().over(w))
      .withColumn("lg", lag($"v", 1).over(w))
      .filter($"rk" <= 5)
    // the rk window may still rewrite only if it is alone in its Window
    // node; with both expressions sharing one spec they fuse into one
    // node and must be left intact
    assert(df.collect().length == 37 * 5)
  }
  test("float/double partition keys are NOT rewritten (-0.0/NaN normalization)") {
    val w = Window.partitionBy($"gd").orderBy($"v", $"id")
    val df = corpus.withColumn("gd", when($"g" === 0, lit(-0.0)).otherwise($"g".cast("double")))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
    assert(!plan(df).contains("TopKPerGroup"))
    // the window plan groups -0.0 with 0.0; results stay window-exact
    assert(df.count() == 37 * 2)
  }
  test("struct-of-float partition keys are NOT rewritten either") {
    val w = Window.partitionBy(struct($"gd")).orderBy($"v", $"id")
    val df = corpus.withColumn("gd", $"g".cast("double"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
    assert(!plan(df).contains("TopKPerGroup"))
  }

  test("narrowing byte/short rank casts are NOT rewritten (overflow wrap)") {
    val w = Window.partitionBy($"g").orderBy($"v", $"id")
    val df = corpus.withColumn("rk", row_number().over(w).cast("byte")).filter($"rk" <= 10)
    assert(!plan(df).contains("TopKPerGroup"))
    val ok = corpus.withColumn("rk", row_number().over(w).cast("long")).filter($"rk" <= 10)
    assert(plan(ok).contains("TopKPerGroup"), "widening long cast must still rewrite")
  }

  test("partial flush cap keeps results exact when group count exceeds it") {
    spark.conf.set("spark.graft.topkRewrite.maxPartialGroups", "5")
    try checkRewritten {
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      corpus.withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
    } finally spark.conf.unset("spark.graft.topkRewrite.maxPartialGroups")
  }
  test("heavy group skew (90% one key) stays exact through the native path") {
    checkRewritten {
      val skewed = spark.range(0, 5000).select(
        when($"id" % 10 =!= 0, 0L).otherwise($"id" % 97).as("g"),
        ($"id" * 31 % 7919).as("v"), $"id")
      skewed.repartition(8)
        .withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"id")))
        .filter($"rk" <= 5)
    }
  }
}
