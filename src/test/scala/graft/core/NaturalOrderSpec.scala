package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class NaturalOrderSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  test("digit runs compare numerically") {
    assert(NaturalOrder.compare("r2", "r10") < 0)
    assert(NaturalOrder.compare("r10", "r2") > 0)
    assert(NaturalOrder.compare("a", "a1") < 0)
    assert(NaturalOrder.compare("file-9", "file-10") < 0)
    assert(NaturalOrder.compare("x100y2", "x100y10") < 0)
    assert(NaturalOrder.compare("abc", "abd") < 0)
    assert(NaturalOrder.compare("same", "same") == 0)
    assert(NaturalOrder.compare("01", "1") < 0) // lexicographic tiebreak
    // equal-value runs with different zero padding must NOT decide the
    // order while later characters differ (r2 regression: naturalKey and
    // compare disagreed on these)
    assert(NaturalOrder.compare("a01z", "a1b") > 0)
    assert(NaturalOrder.compare("a1z", "a01b") > 0)
    assert(NaturalOrder.compare("a01", "a1") < 0)
  }

  test("sorted sample matches expectation") {
    val ids = Seq("item10", "item2", "item1", "b", "a2", "a10", "a")
    assert(ids.sorted(NaturalOrder) == Seq("a", "a2", "a10", "b", "item1", "item2", "item10"))
  }

  val genId: Gen[String] = Gen.choose(0, 16).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      3 -> Gen.alphaChar,
      2 -> Gen.numChar,
      1 -> Gen.oneOf('-', '_', '.', ' '))).map(_.mkString))

  test("naturalKey lexicographic order == NaturalOrder") {
    check(Prop.forAll(genId, genId) { (a, b) =>
      val byKey = NaturalOrder.naturalKey(a).compareTo(NaturalOrder.naturalKey(b))
      val byCmp = NaturalOrder.compare(a, b)
      math.signum(byKey.toDouble) == math.signum(byCmp.toDouble)
    })
  }
}
