package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 36 (jackknife,
  * threshold operating curve, inter-arrival profile, dedup datasheet,
  * frame budget): leave-one-out replays, curve monotonicity with a
  * binding knee, order-statistic replays, before/after conservation,
  * and exact budget conservation under inventory caps.
  */
class Batch33Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r134: leave-one-day-out estimates replay and the CI brackets the point") {
    val ev = graft.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("value"))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1)))
    def cents(v: Double): Long =
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
    val daily = ev.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(e => cents(e._2)).sum)).toMap
    val (nn, ss, g) = (daily.values.map(_._1).sum, daily.values.map(_._2).sum,
      daily.size.toLong)
    val thetas = daily.values.map { case (n, s) =>
      math.round((ss - s).toDouble / (nn - n) / 100.0 * 1e6)
    }.toSeq
    val (st, stt) = (thetas.sum, thetas.map(t => t * t).sum)
    val jvar = (g - 1).toDouble / g * (g * stt - st.toDouble * st) / g / 1e12
    val point = ss.toDouble / nn / 100.0
    val Seq(row) = run("r134_jackknife").collect().toSeq
    assert(row.getLong(0) == g)
    assert(math.abs(row.getDouble(1) - r4(point)) < 1e-9)
    assert(math.abs(row.getDouble(2) - BigDecimal(math.sqrt(jvar))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(row.getDouble(3) - r4(point - 1.96 * math.sqrt(jvar))) < 1e-9)
    assert(math.abs(row.getDouble(4) - r4(point + 1.96 * math.sqrt(jvar))) < 1e-9)
    assert(row.getDouble(3) < row.getDouble(1) && row.getDouble(1) < row.getDouble(4))
    assert(row.getDouble(2) > 0, "jackknife SE degenerate — all days identical")
  }

  test("d34: confusion cells replay; recall falls monotonically and the knee binds") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val byId = docs.toMap
    def pairsFrom(group: Seq[(Long, Long)], label: String) =
      group.map { case (a, b) =>
        val (sa, sb) = (shingles(byId(a)), shingles(byId(b)))
        val inter = (sa intersect sb).size.toLong
        val uni = sa.size + sb.size - inter
        (label, inter * 10000 / uni)
      }
    val fam = docs.groupBy(t => md5hex(t._2.take(100))).values.flatMap { f =>
      val ids = f.map(_._1).sorted; ids.zip(ids.drop(1))
    }.toSeq
    val shuf = docs.map(t => (md5hex(s"shuffle:${t._1}"), t._1))
      .groupBy(_._1.substring(0, 2)).values.flatMap { b =>
        val s = b.toSeq.sortBy(identity).map(_._2); s.zip(s.drop(1))
      }.toSeq
    val scored = pairsFrom(fam, "pos") ++ pairsFrom(shuf, "neg")
    val got = run("d34_threshold_sweep").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.map(_._1).toSeq == ExtraQueries34.ThresholdsBp)
    got.foreach { case (thr, tp, fp, fn, p, r, f1) =>
      val wtp = scored.count(s => s._1 == "pos" && s._2 >= thr).toLong
      val wfp = scored.count(s => s._1 == "neg" && s._2 >= thr).toLong
      val wfn = scored.count(s => s._1 == "pos" && s._2 < thr).toLong
      assert((tp, fp, fn) == (wtp, wfp, wfn), s"thr=$thr cells diverge")
      assert(math.abs(p - r4(wtp.toDouble / math.max(wtp + wfp, 1L))) < 1e-9)
      assert(math.abs(r - r4(wtp.toDouble / math.max(wtp + wfn, 1L))) < 1e-9)
      assert(math.abs(f1 - r4(2.0 * wtp / math.max(2 * wtp + wfp + wfn, 1L))) < 1e-9)
    }
    val recalls = got.map(_._6)
    assert(recalls.sliding(2).forall(p => p.head >= p.last), "recall must be nonincreasing")
    assert(recalls.head > recalls.last,
      "the sweep never binds — every threshold classifies identically")
    assert(got.head._7 > 0.9, "shingle Jaccard should separate the planted dups cleanly")
  }

  test("r136: gap statistics and order statistics replay; streams are near-Poisson") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val got = run("r136_interarrival_profile").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    got.foreach { case (et, n, mean, med, p90, cov) =>
      val ts = ev.filter(_._1 == et).sortBy(e => (e._2.getTime, e._3))
        .map(_._2.getTime / 1000)
      val gaps = ts.zip(ts.drop(1)).map(p => p._2 - p._1)
      assert(n == gaps.length.toLong)
      assert(math.abs(mean - r4(gaps.sum.toDouble / gaps.length)) < 1e-9)
      val sorted = gaps.sorted
      def sel(num: Int, den: Int): Long = {
        val k = (gaps.length.toLong * num + den - 1) / den
        sorted((k - 1).toInt)
      }
      assert(med == sel(1, 2), s"$et median diverges")
      assert(p90 == sel(9, 10), s"$et p90 diverges")
      val (sg, sgg) = (gaps.sum, gaps.map(x => x * x).sum)
      val sd = math.sqrt((n * sgg - sg.toDouble * sg) / (n.toDouble * (n - 1)))
      assert(math.abs(cov - r4(sd / (sg.toDouble / n))) < 1e-9)
      // exponential arrivals → CoV ≈ 1; far outside this band means the
      // fixture (or the gap math) changed shape
      assert(cov > 0.7 && cov < 1.4, s"$et CoV $cov far from Poisson")
    }
  }

  test("t47: both stages replay; dedup removes tokens but not vocabulary") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keepers = docs.groupBy(t => md5hex(t._2.take(100))).values
      .map(f => f.minBy(_._1)).toSeq
    def stats(rows: Seq[(Long, String)]): (Long, Long, Long, Double) = {
      val toks = rows.map(_._2.split(" ", -1))
      val micro = toks.map(ts => math.round(ts.distinct.length * 10000.0 / ts.length))
      (rows.size.toLong, toks.map(_.length.toLong).sum,
        toks.flatten.distinct.length.toLong,
        r4(micro.sum.toDouble / (rows.size * 10000.0)))
    }
    val got = run("t47_dedup_effect").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val raw = stats(docs); val ded = stats(keepers)
    assert(got("a_raw") == ((raw._1, raw._2, raw._3, raw._4)))
    assert(got("b_deduped") == ((ded._1, ded._2, ded._3, ded._4)))
    assert(ded._1 < raw._1 && ded._2 < raw._2, "dedup must remove docs and tokens here")
    assert(ded._3 == raw._3, "dedup must not cost vocabulary on this corpus")
  }

  test("m23: the frame budget conserves exactly and every quota respects its inventory") {
    val vids = graft.Tables.documents(spark, sf)
      .filter(col("source") =!= "src0" && col("source") =!= "src1")
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), math.max(1L, r.getLong(1) / 64)))
    val per = vids.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val ff = per.values.map(_._2).sum
    val B = ExtraQueries34.FrameBudget
    assert(B < ff, "budget must sit below inventory for the plan to bind")
    val got = run("m23_frame_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSet == per.keySet)
    got.foreach { case (src, nv, frames, quota, stride) =>
      assert((nv, frames) == per(src), s"$src inventory diverges")
      assert(quota <= frames, s"$src quota exceeds inventory")
      assert(stride == math.ceil(frames.toDouble / math.max(quota, 1L)).toLong)
      val base = B * frames / ff
      assert(quota == base || quota == base + 1, s"$src quota off the largest-remainder grid")
    }
    assert(got.map(_._4).sum == B, "the frame budget must conserve exactly")
  }
}
