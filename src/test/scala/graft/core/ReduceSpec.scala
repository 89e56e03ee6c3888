package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** F3 reduce-lattice table — mirrors the reference's
  * test/test-utility-reduce.js:8-88 expectations. */
class ReduceSpec extends AnyFunSuite {
  import PoValue.of

  private def reduce(vs: PoValue*): PoValue = Reduce.reduceAll(vs.iterator)

  test("arrays concatenate depth-1") {
    assert(reduce(of(Seq(1, 2, 3)), of(Seq(4, 5, 6))) == of(Seq(1, 2, 3, 4, 5, 6)))
    // nested arrays are not flattened
    assert(reduce(PoArr(Vector(of(Seq(1)))), PoArr(Vector(of(Seq(2))))) ==
      PoArr(Vector(of(Seq(1)), of(Seq(2)))))
  }

  test("strings: last wins") {
    assert(reduce(PoStr("abc"), PoStr("def")) == PoStr("def"))
  }

  test("sets union") {
    assert(reduce(PoSet(of(1), of(2), of(3)), PoSet(of(2), of(3), of(4))) ==
      PoSet(of(1), of(2), of(3), of(4)))
  }

  test("bytes: last wins") {
    assert(reduce(PoBytes.fromString("hello"), PoBytes.fromString("world")) ==
      PoBytes.fromString("world"))
  }

  test("numbers sum") {
    assert(reduce(of(1), of(2), of(3)) == PoInt(6))
    assert(reduce(PoNum(1.5), PoInt(2)) == PoNum(3.5))
  }

  test("bigints sum") {
    assert(reduce(PoBigInt(1), PoBigInt(2), PoBigInt(3)) == PoBigInt(6))
  }

  test("dates: most future wins") {
    assert(reduce(PoDate(1000), PoDate(5000), PoDate(2000)) == PoDate(5000))
  }

  test("objects merge recursively, later own-keys win per-branch") {
    val a = PoObj("a" -> PoStr("1"), "b" -> PoStr("2"), "c" -> PoStr("3"))
    val b = PoObj("a" -> PoStr("5"), "d" -> PoStr("4"))
    assert(reduce(a, b) ==
      PoObj("a" -> PoStr("5"), "b" -> PoStr("2"), "c" -> PoStr("3"), "d" -> PoStr("4")))
  }

  test("maps merge recursively per key") {
    val a = PoMap.of(of(1) -> PoStr("foo"), of(2) -> PoStr("bar"))
    val b = PoMap.of(of(2) -> PoStr("yehaw"), of(3) -> PoStr("nah"))
    assert(reduce(a, b) ==
      PoMap.of(of(1) -> PoStr("foo"), of(2) -> PoStr("yehaw"), of(3) -> PoStr("nah")))
  }

  test("mixed types: last value wins") {
    assert(reduce(of(1), PoStr("x")) == PoStr("x"))
    assert(reduce(PoStr("x"), of(Seq(1))) == of(Seq(1)))
    assert(reduce(PoBool(true), PoNull) == PoNull)
  }

  test("complex: six partial objects with sets and counters") {
    // reference test-utility-reduce.js:67-87
    val parts = Seq(
      PoObj("id" -> of(5), "url" -> PoStr("http://foo.com/item/1")),
      PoObj("regions" -> PoSet(PoStr("nsw"))),
      PoObj("tags" -> PoSet(PoStr("bird"))),
      PoObj("tags" -> PoSet(PoStr("person"))),
      PoObj("counter" -> of(1)),
      PoObj("counter" -> of(1)),
    )
    val got = Reduce.reduceAll(parts.iterator)
    assert(got == PoObj(
      "id" -> of(5),
      "url" -> PoStr("http://foo.com/item/1"),
      "regions" -> PoSet(PoStr("nsw")),
      "tags" -> PoSet(PoStr("bird"), PoStr("person")),
      "counter" -> of(2)))
  }
}
