package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for ExtraQueries8: Java-regex replay of
  * the journey-pattern counts (pinning the greedy non-overlapping
  * semantics both engines must share), and the Count-Min one-sided-error
  * guarantee against a brute-force sketch replay.
  */
class ExtraQueries8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r99 journey patterns match a driver-side Java-regex replay over capped journeys") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("code"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3))))
    val journeys = ev.groupBy(_._1).map { case (_, rows) =>
      rows.map(_._2).sortBy(t => (t._1, t._2)).take(ExtraQueries8.JourneyCap)
        .map(_._3).mkString
    }.toSeq
    val got = graft.SparkEntry.queries("r99_event_patterns")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == ExtraQueries8.JourneyPatterns.map(_._1).toSet)
    ExtraQueries8.JourneyPatterns.foreach { case (name, re) =>
      val p = java.util.regex.Pattern.compile(re)
      val counts = journeys.map { j =>
        val m = p.matcher(j); var c = 0L; while (m.find()) c += 1; c
      }
      val expect = (counts.size.toLong, counts.count(_ > 0).toLong, counts.sum, counts.max)
      assert(got(name) == expect, s"$name: ${got(name)} vs replay $expect")
    }
    // the semantics pin: greedy non-overlapping count of the one
    // quantifier-bearing pattern on a case both engines were checked on
    val m = java.util.regex.Pattern.compile("vc*p").matcher("vcvpvccpep")
    var c = 0; while (m.find()) c += 1
    assert(c == 2, "Java regex must agree with RE2's leftmost non-overlapping count")
  }

  test("t32 count-min: estimates never undercount, collisions are exercised, replay agrees") {
    val rows = graft.SparkEntry.queries("t32_countmin")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (tok, exact, est, over) =>
      assert(est >= exact, s"$tok: CM must never undercount")
      assert(over == est - exact, s"$tok: overcount accounting")
    }
    assert(rows.map(_._4).sum > 0,
      "undersized width must actually collide — a zero-error sketch grades nothing")
    // brute-force sketch replay on the driver
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t")).collect().map(_.getString(0))
    val exactCnt = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def cell(r: Int, tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$tok".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % ExtraQueries8.CmWidth
    }
    val sketch = scala.collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    exactCnt.foreach { case (tok, n) =>
      (1 to ExtraQueries8.CmDepth).foreach(r => sketch((r, cell(r, tok))) += n)
    }
    rows.foreach { case (tok, exact, est, _) =>
      assert(exact == exactCnt(tok), s"$tok: exact count")
      val replay = (1 to ExtraQueries8.CmDepth).map(r => sketch((r, cell(r, tok)))).min
      assert(est == replay, s"$tok: estimate vs sketch replay")
    }
  }
}
