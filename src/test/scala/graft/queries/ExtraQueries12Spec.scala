package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the batch-12 queries: the CDC
  * boundary-locality property under a planted prefix edit, attribution
  * accounting laws, silence-trim geometry laws, and an independent
  * percentile replay for the SLA report.
  */
class ExtraQueries12Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5Mod(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % m
  }

  /** Driver-side CDC chunker — the definition the query must match. */
  private def chunk(tokens: Seq[String]): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    tokens.foreach { t =>
      cur += t
      if (md5Mod(s"cdc:$t", ExtraQueries12.CdcMod) == 0) {
        out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer[String]()
      }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  test("d23: chunk accounting matches a driver replay; CDC edits stay local") {
    val texts = graft.Tables.documents(spark, sf).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = texts.groupBy(_._1)
    val got = graft.SparkEntry.queries("d23_cdc_chunks")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, docs) =>
      val chunks = docs.flatMap(d => chunk(d._2.split(" ", -1).toSeq))
      val byContent = chunks.groupBy(identity)
      val nChunks = chunks.size.toLong
      val nDistinct = byContent.size.toLong
      val totalTokens = chunks.map(_.size.toLong).sum
      val savings = byContent.map { case (c, occ) => (occ.size - 1).toLong * c.size }.sum
      assert(got(src) == ((nChunks, nDistinct, totalTokens, savings)),
        s"$src: ${got(src)} vs replay ($nChunks, $nDistinct, $totalTokens, $savings)")
    }
    // the CDC property: a planted PREFIX edit shifts only the first
    // chunk — every chunk after the first breakpoint is unchanged,
    // while fixed-width windows would shift all of them
    val doc = texts.map(_._2).maxBy(_.length).split(" ", -1).toSeq
    val orig = chunk(doc).map(_.mkString(" "))
    val edited = chunk("zzz" +: doc).map(_.mkString(" "))
    assert(orig.size > 2, "fixture doc must chunk into >2 pieces for the locality check")
    // whether or not the inserted token is itself a breakpoint, every
    // original chunk after the first survives the edit verbatim
    assert(orig.tail.forall(edited.contains),
      "a prefix edit must leave all chunks after the first breakpoint unchanged")
  }

  test("u23: attribution shares are a partition of the absolute movement") {
    val rows = graft.SparkEntry.queries("u23_delta_attribution")(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val absTotal = rows.map(t => math.abs(t._3)).sum
    rows.foreach { case (prev, cur, delta, share) =>
      assert(delta == cur - prev, "delta accounting")
      assert(share >= 0.0 && share <= 1.0, "share range")
      assert(math.abs(share - math.abs(delta).toDouble / absTotal) < 1e-5,
        "share must be |delta| / total absolute movement")
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3,
      "shares must partition the total movement")
    // ranking: output is ordered by |delta| descending
    val deltas = rows.map(t => math.abs(t._3))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b }, "|delta| ordering")
  }

  test("m15: trim geometry laws hold and agree with m08's voiced frames") {
    val rows = graft.SparkEntry.queries("m15_silence_trim")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nf, nv, lead, tail, retained) =>
      assert(lead + tail + retained == nf, s"doc $id: trim partition of the frame count")
      assert(nv <= retained, s"doc $id: voiced frames live inside the retained span")
      if (nv == 0) assert(retained == 0, s"doc $id: silent asset retains nothing")
    }
    // consistency with the registered m08 segments: the retained span's
    // endpoints are exactly the first/last voiced frames m08 segments
    val segs = graft.SparkEntry.queries("m08_vad_segments")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val firstLast = segs.groupBy(_._1).map { case (id, ss) =>
      id -> (ss.map(_._2).min, ss.map(_._3).max)
    }
    val byId = rows.map(t => t._1 -> t).toMap
    firstLast.foreach { case (id, (first, last)) =>
      val (_, nf, nv, lead, tail, _) = byId(id)
      assert(lead == first, s"doc $id: lead trim vs m08 first voiced frame")
      assert(tail == nf - 1 - last, s"doc $id: tail trim vs m08 last voiced frame")
      assert(nv > 0)
    }
  }

  test("r107: SLA percentiles match an exact driver-side replay") {
    val dd = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      .join(graft.Tables.orders(spark, sf)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), datediff(col("sd"), col("od")).as("days"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
    val got = graft.SparkEntry.queries("r107_sla_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    dd.groupBy(_._1).foreach { case (pri, rows) =>
      val days = rows.map(_._2).sorted
      val n = days.length
      def pct(q: Double): Long = days(math.ceil(q * n).toInt - 1)
      val breaches = days.count(_ > ExtraQueries12.SlaDays).toLong
      val (gn, p50, p90, gb) = got(pri)
      assert(gn == n.toLong, s"$pri n")
      assert(p50 == pct(0.5), s"$pri p50: $p50 vs ${pct(0.5)}")
      assert(p90 == pct(0.9), s"$pri p90: $p90 vs ${pct(0.9)}")
      assert(gb == breaches, s"$pri breaches")
    }
  }
}
