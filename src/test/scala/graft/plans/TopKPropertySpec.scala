package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property check for the native top-k rewrite: on RANDOM data, group
  * counts, and k, the rewritten plan must return exactly the rows and
  * ranks of the built-in window plan. The order key embeds a unique
  * row index so row_number is deterministic and the comparison exact.
  * Fewer cases than a pure-JVM property (each case runs two Spark
  * jobs), but each case is a full end-to-end plan execution.
  */
class TopKPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rewritten result == window result on random data / groups / k") {
    val gen = for {
      n <- Gen.choose(1, 400)
      groups <- Gen.choose(1, 50)
      k <- Gen.choose(1, 12)
      vals <- Gen.listOfN(n, Gen.choose(-1000, 1000))
      seed <- Gen.choose(0, 1000)
    } yield (groups, k, vals, seed)
    val prop = Prop.forAll(gen) { case (groups, k, vals, seed) =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        ((v.toLong + seed) % groups, v, i.toLong)
      }
      val df = rows.toDF("g", "v", "idx")
      def run(): Array[String] = df
        .withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"idx")))
        .filter($"rk" <= k)
        .collect().map(_.toString).sorted
      val plan = df
        .withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"idx")))
        .filter($"rk" <= k)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("TopKPerGroup"), "rewrite must fire for every generated case")
      val on = run()
      spark.conf.set("spark.graft.topkRewrite.enabled", "false")
      val off = try run() finally spark.conf.unset("spark.graft.topkRewrite.enabled")
      on.sameElements(off)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
