package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based hardening for the pure cores of the new primitives:
  * the Misra-Gries guarantee must hold for ANY stream content, ANY
  * capacity, and ANY partitioning/merge shape (that is the claim that
  * makes t13's two-pass exactness safe), and the NearestCentroid eval
  * must equal brute-force argmin with lowest-id tie-breaks on inputs
  * engineered to tie often. */
class SketchPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(result.passed, result.status.toString)
  }

  test("misra-gries bounds hold for any stream, capacity, and merge split") {
    val tokenGen = Gen.listOf(Gen.oneOf(('a' to 'k').map(_.toString)))
    val kGen = Gen.choose(2, 8)
    val cutsGen = Gen.listOf(Gen.choose(0, 40))
    check(Prop.forAll(tokenGen, kGen, cutsGen) { (stream, k, cuts) =>
      val mg = new MisraGries(k)
      // split the stream at arbitrary positions -> partial summaries
      val bounds = (cuts.map(_ % (stream.length + 1)) :+ 0 :+ stream.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => stream.slice(a, b) }
      val summaries = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = summaries.foldLeft(mg.zero)(mg.merge)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.length.toLong
      val slack = n / (k + 1)
      val sized = merged.size <= k
      val bounded = merged.forall { case (t, est) =>
        est <= exact(t) && est >= exact(t) - slack
      }
      val complete = exact.forall { case (t, c) => c <= slack || merged.contains(t) }
      sized && bounded && complete
    })
  }

  test("nearest-centroid eval equals brute-force argmin with lowest-id ties") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // half-integer grid coordinates make exact distance ties common
    val coord = Gen.choose(-4, 4).map(_ / 2.0)
    val dimGen = Gen.choose(1, 5)
    val gen = for {
      dim <- dimGen
      v <- Gen.listOfN(dim, coord)
      k <- Gen.choose(1, 6)
      cents <- Gen.listOfN(k, Gen.listOfN(dim, coord))
    } yield (v, cents)
    check(Prop.forAll(gen) { case (v, cents) =>
      val ids = cents.indices.toList
      val expected = ids.minBy { i =>
        val d = v.zip(cents(i)).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, i)
      }
      val expr = graft.expressions.NearestCentroid(
        Literal.create(v, ArrayType(DoubleType)),
        ids, cents.map(_.toVector), 0)
      expr.eval(null) == expected
    })
  }
}
