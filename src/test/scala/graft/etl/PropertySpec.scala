package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (SURVEY.md §5.3) on the pure driver-side logic.
  * Raw scalacheck (no scalatest bridge in the offline cache): each
  * property is executed with 200 cases and must pass them all. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(result.passed, result.status.toString)
  }

  test("classifier is total: any string maps to one of the 7 categories") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      RuleClassifier.Categories.contains(RuleClassifier.classify(s))
    })
  }

  test("classifier is case-insensitive") {
    check(Prop.forAll(Gen.oneOf(
      "Exclusion Criteria: pregnant", "inclusion: postpartum only",
      "trying to get pregnant", "nothing relevant", "must be pregnant",
      "negative pregnancy test required")) { s =>
      RuleClassifier.classify(s) == RuleClassifier.classify(s.toUpperCase)
    })
  }

  test("prompt templating round-trips whenever all fields are present") {
    val keyGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val valGen = Gen.asciiPrintableStr.suchThat(v => !v.contains("{") && !v.contains("}"))
    check(Prop.forAll(keyGen, valGen) { (k, v) =>
      PromptTemplate.format(s"pre {$k} post", Map(k -> v)).contains(s"pre $v post")
    })
  }

  test("prompt templating: any missing field yields None") {
    val keyGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    check(Prop.forAll(keyGen) { k =>
      PromptTemplate.format(s"x {$k} {missingfield} y", Map(k -> "v")).isEmpty
    })
  }

  test("essie parser round-trips every reference config term") {
    Essie.referenceConfigTerms.foreach { t =>
      Essie.compile(Essie.parse(t)) // must parse + compile without throwing
    }
  }

  test("essie OR-splitter respects nesting depth") {
    Essie.parse("(SEARCH[Location](AREA[LocationCountry]Canada) OR AREA[Sex]ALL)") match {
      case Essie.Or(terms) => assert(terms.size == 2)
      case other => fail(s"expected Or, got $other")
    }
  }
}
