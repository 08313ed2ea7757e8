package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Hand-computed pins for the BPE merge-mining trainer (t15) beyond the
  * oracle match: exact merge tables on constructed corpora, the
  * alternation-run exhaustiveness edge, and early-stop semantics. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def train(text: String, rounds: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    TextQueries.bpeTrain(Seq(text).toDF("text"), rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("hand-computed merge table, multi-round, early stop when exhausted") {
    // words: ab x3, abc x2 -> (a,b)=5 wins round 1; the merged symbol
    // 'ab' then pairs with c (count 2) in round 2; nothing pairable
    // remains, so 6 requested rounds stop after 2.
    assert(train("ab ab ab abc abc", 6) ==
      Seq((1, "a", "b", 5L), (2, "ab", "c", 2L)))
  }

  test("alternation runs merge exhaustively (replace-pass fixpoint)") {
    // (x,y) appears 5+2=7 times across both words. An exhaustive merge
    // leaves only xy symbols, whose self-pairs are excluded, so round 2
    // finds nothing. A non-exhaustive merge (too few replace passes)
    // would leave ' y x ' residue pairs alive and FAIL this early-stop.
    assert(train("xyxyxyxyxy xyxy", 3) == Seq((1, "x", "y", 7L)))
  }

  test("hand-computed corpus encode through the trained merges (t17 path)") {
    import spark.implicits._
    val corpus = Seq((1L, "ab ab ab abc abc"), (2L, "ba cab")).toDF("doc_id", "text")
    def enc(rounds: Int) = TextQueries.bpeEncode(corpus, rounds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toList
    // merges on this corpus: r1 (a,b) pc 6, r2 (ab,c) pc 2, r3 (b,a)
    // pc 1 (tie vs (c,ab) broken on lhs), r4 (c,ab) pc 1, then
    // exhausted. Full training collapses every word to ONE symbol:
    assert(enc(6) == List((1L, 5L, 12L, 5L, 2.4), (2L, 2L, 5L, 2L, 2.5)))
    // stopping after 2 rounds leaves doc 2 half-encoded: 'ba' -> b a,
    // 'cab' -> c ab (2 tokens each)
    assert(enc(2) == List((1L, 5L, 12L, 5L, 2.4), (2L, 2L, 5L, 4L, 1.25)))
  }

  test("best-pair count is non-increasing across rounds (fixture)") {
    // a merged pair's occurrences bound any new pair it creates, and
    // existing counts never grow — so the winning count is monotone
    val pcs = graft.SparkEntry.queries("t15_bpe_merges")(spark, sf)
      .collect().map(_.getLong(3)).toSeq
    assert(pcs == pcs.sortBy(-(_: Long)), pcs.mkString(","))
    assert(pcs.length == TextQueries.BpeRounds)
  }
}
