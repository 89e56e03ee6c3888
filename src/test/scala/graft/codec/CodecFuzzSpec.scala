package graft.codec

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Property fuzz: arbitrary PoValue trees round-trip through every
  * full codec. Two documented representational ambiguities are excluded
  * by construction (the reference shares both):
  *  - objects with exactly the keys {type, data} are wrapper forms in
  *    JSON/YAML (the generator never emits that exact shape);
  *  - arrays whose head is a tag-like string are markup in XML (the
  *    generator starts arrays with non-name material).
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val genLeaf: Gen[PoValue] = Gen.oneOf(
    Gen.const(PoNull),
    Gen.const(PoUndefined),
    Gen.oneOf(true, false).map(PoBool.apply),
    Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(PoInt.apply),
    Gen.oneOf(Gen.chooseNum(-1e12, 1e12).map(d => PoNum(d + 0.5)),
      Gen.oneOf(PoNum(Double.NaN), PoNum(Double.PositiveInfinity),
        PoNum(Double.NegativeInfinity))),
    Gen.chooseNum(0L, Long.MaxValue).map(n => PoBigInt(BigInt(n) * BigInt(n) + 7)),
    Gen.asciiPrintableStr.map(PoStr.apply),
    Gen.oneOf("中文 🎉", "عربى", "tab\tnewline\n", "").map(PoStr.apply),
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(b => PoBytes(b.toArray)),
    Gen.chooseNum(-4102444800000L, 4102444800000L).map(PoDate.apply),
    Gen.const(PoURL("https://example.com/p?x=1")))

  private def genValue(depth: Int): Gen[PoValue] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      1 -> Gen.listOf(Gen.lzy(genValue(depth - 1)))
        // head marker avoids the markup interpretation in XML
        .map(xs => PoArr(PoInt(xs.length.toLong) +: xs.toVector)),
      1 -> Gen.listOf(Gen.zip(Gen.alphaNumStr.suchThat(_ != "type"), Gen.lzy(genValue(depth - 1))))
        .map(kvs => PoObj(scala.collection.immutable.VectorMap.from(kvs))),
      1 -> Gen.listOf(Gen.lzy(genValue(depth - 1))).map(PoSet.fromSeq),
      1 -> Gen.listOf(Gen.zip(Gen.lzy(genValue(depth - 1)), Gen.lzy(genValue(depth - 1))))
        .map(kvs => PoMap(kvs.toVector)))

  private def nanEq(a: PoValue, b: PoValue): Boolean = (a, b) match {
    case (PoNum(x), PoNum(y)) if x.isNaN && y.isNaN => true
    case (PoArr(x), PoArr(y)) =>
      x.length == y.length && x.zip(y).forall(t => nanEq(t._1, t._2))
    case (PoObj(x), PoObj(y)) =>
      x.keys.toSeq == y.keys.toSeq && x.keys.forall(k => nanEq(x(k), y(k)))
    case (x: PoSet, y: PoSet) =>
      x.items.length == y.items.length && x.items.zip(y.items).forall(t => nanEq(t._1, t._2))
    case (x: PoMap, y: PoMap) =>
      x.entries.length == y.entries.length &&
        x.entries.zip(y.entries).forall { case ((k1, v1), (k2, v2)) => nanEq(k1, k2) && nanEq(v1, v2) }
    case _ => a == b
  }

  private def fuzz(codec: Codec, name: String): Unit = {
    val prop = Prop.forAll(genValue(3)) { v =>
      val back = codec.decode(codec.encode(v))
      if (!nanEq(back, v)) {
        println(s"$name mismatch:\n  in:  $v\n  out: $back")
        false
      } else true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, s"$name fuzz: ${r.status}")
  }

  test("CBOR fuzz roundtrip")(fuzz(CborCodec, "cbor"))
  test("JSON fuzz roundtrip")(fuzz(JsonCodec, "json"))
  test("MsgPack fuzz roundtrip")(fuzz(MsgPackCodec, "msgpack"))
  test("XML fuzz roundtrip")(fuzz(XmlCodec, "xml"))
  test("YAML fuzz roundtrip")(fuzz(YamlCodec, "yaml"))
}
