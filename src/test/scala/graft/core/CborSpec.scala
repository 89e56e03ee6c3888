package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** F4 codec corpus roundtrip over the canonical binary codec, plus
  * generative roundtrip/hash properties. */
class CborSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }
  import PoValue.of

  /** The reference's shared fixture corpus (test/test-models-codec.js:8-52). */
  val corpus: Seq[PoValue] = Seq(
    PoBool(true), PoBool(false), of(5), of(9274), PoNum(0.0001), PoNull,
    PoArr(Vector(PoNum(Double.PositiveInfinity), PoNum(Double.NegativeInfinity), PoNum(Double.NaN), PoUndefined)),
    PoBytes.fromString("hello world"),
    of(Seq(1, 2, 3)),
    PoArr(Vector(PoNull, PoNull, PoUndefined, PoNull)),
    PoObj("a" -> of(1), "b" -> of(2)),
    PoObj("1" -> PoBool(false), "2" -> PoBool(true)),
    PoSet(of(1), of(2), of(3), PoStr("a"), PoStr("b"), PoStr("c")),
    PoMap.of(PoStr("a") -> of(1), of(2) -> PoStr("3"), PoBool(true) -> of(9)),
    PoObj("deep" -> PoArr(Vector(PoObj("deeper" -> PoArr(Vector(of(1), PoStr("x"))))))),
    // JsonML markup node
    PoArr(Vector(PoStr("element"), PoObj("name" -> PoStr("foo")), PoStr("text node"),
      PoArr(Vector(PoStr("subel"), PoObj("name" -> PoStr("bar")))), PoStr("after text node"))),
    PoStr("مرحبا بالعالم"), PoStr("வணக்கம் உலகம்"), PoStr("你好世界"),
    PoStr("नमस्ते दुनिया"), PoStr("Γειά σου Κόσμε"), PoStr("Привет мир"),
    PoStr("♔♕♖♗♘♙"), PoStr("👋🏽🌍👨‍👩‍👧‍👦"),
    PoBigInt(BigInt("123456789012345678901234567890")),
    PoBigInt(BigInt("-123456789012345678901234567890")),
    PoDate(1723400000123L), PoDate(-86400000L),
    PoURL("https://example.com/x?y=1"),
    PoInt(Long.MaxValue), PoInt(Long.MinValue), PoInt(-1), PoInt(0),
  )

  test("corpus roundtrips through CBOR") {
    corpus.foreach { v =>
      val back = Cbor.decode(Cbor.encode(v))
      // NaN != NaN under ==; compare encodings instead
      assert(java.util.Arrays.equals(Cbor.encode(back), Cbor.encode(v)), s"roundtrip failed for $v")
    }
  }

  test("hash is order-insensitive for sets/maps, sensitive for arrays/objects insertion changes value equality") {
    val s1 = PoSet(of(1), of(2), of(3))
    val s2 = PoSet(of(3), of(2), of(1))
    assert(Cbor.hash(s1) == Cbor.hash(s2))
    val m1 = PoMap.of(of(1) -> PoStr("a"), of(2) -> PoStr("b"))
    val m2 = PoMap.of(of(2) -> PoStr("b"), of(1) -> PoStr("a"))
    assert(Cbor.hash(m1) == Cbor.hash(m2))
    // canonical object key sort: same fields, different insertion order
    val o1 = PoObj("x" -> of(1), "y" -> of(2))
    val o2 = PoObj("y" -> of(2), "x" -> of(1))
    assert(Cbor.hash(o1) == Cbor.hash(o2))
    // arrays ARE order-sensitive
    assert(Cbor.hash(of(Seq(1, 2))) != Cbor.hash(of(Seq(2, 1))))
  }

  test("hash is 64 hex chars and distinct for distinct values") {
    val hashes = corpus.map(Cbor.hash)
    hashes.foreach(h => assert(h.matches("[0-9a-f]{64}")))
    assert(hashes.distinct.size == hashes.size)
  }

  // ---- generative roundtrip ----
  val genScalar: Gen[PoValue] = Gen.oneOf(
    Gen.const(PoNull), Gen.const(PoUndefined),
    Gen.oneOf(true, false).map(PoBool),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(PoInt),
    Gen.chooseNum(-1e18, 1e18).map(PoNum(_)),
    Gen.alphaNumStr.map(PoStr),
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(l => PoBytes(l.toArray)),
    Gen.chooseNum(-4102444800000L, 4102444800000L).map(PoDate),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(n => PoBigInt(BigInt(n) * 1000003)),
  )
  def genValue(depth: Int): Gen[PoValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      4 -> genScalar,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(l => PoArr(l.toVector)),
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(l => PoSet.fromSeq(l)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr, genValue(depth - 1)))
        .map(kvs => PoObj(scala.collection.immutable.VectorMap.from(kvs))),
      1 -> Gen.listOfN(2, Gen.zip(genValue(0), genValue(depth - 1)))
        .map(kvs => kvs.foldLeft(PoMap(Vector.empty))((m, kv) => m.updated(kv._1, kv._2))),
    )

  test("generated values roundtrip and hash deterministically") {
    check(Prop.forAll(genValue(3)) { v =>
      val enc = Cbor.encode(v)
      val back = Cbor.decode(enc)
      java.util.Arrays.equals(Cbor.encode(back), enc) && Cbor.hash(v) == Cbor.hash(back)
    })
  }
}
