package graft.codec

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** The shared codec fixture corpus (FIXTURES.md F4; reference
  * test/test-models-codec.js:8-52) run through every codec with
  * encode+decode — `decode(encode(x)) == x`. */
class CodecCorpusSpec extends AnyFunSuite {
  import PoValue.of

  // reference corpus :8-18 — unicode incl. skin-tone emoji
  private val unicodeStrings = Seq(
    "", "hello world",
    "العربية", "தமிழ்", "中文", "संस्कृतम्", "Ελληνικά", "русский",
    "♔♕♖♗♘♙", "👨‍👩‍👧‍👦 👍🏽 🏳️‍🌈",
    "line\nbreaks\tand \"quotes\" \\ backslash")

  private def corpus: Seq[PoValue] = Seq(
    PoBool(true), PoBool(false),
    PoInt(5), PoInt(9274), PoNum(0.0001), PoNull,
    PoNum(Double.PositiveInfinity), PoNum(Double.NegativeInfinity),
    PoNum(Double.NaN),
    PoArr(Vector(PoNull, PoNull, PoUndefined, PoNull)),
    PoBytes.fromString("hello world"),
    PoArr(Vector(PoInt(1), PoInt(2), PoInt(3))),
    PoObj("a" -> PoInt(1), "b" -> PoInt(2)),
    PoObj("1" -> PoBool(false), "2" -> PoBool(true)),
    PoSet(PoInt(1), PoInt(2), PoInt(3), PoStr("a"), PoStr("b"), PoStr("c")),
    PoMap.of(PoStr("a") -> PoInt(1), PoInt(2) -> PoStr("3"), PoBool(true) -> PoInt(9)),
    PoBigInt(BigInt("123456789012345678901234567890")),
    PoDate(1700000000123L),
    PoURL("https://example.com/x?q=1"),
    // deep nesting: objects in arrays in objects, mixed (:47-50)
    PoObj("deep" -> PoArr(Vector(
      PoObj("x" -> PoArr(Vector(PoInt(1), PoObj("y" -> PoSet(PoStr("s")))))),
      PoMap.of(PoStr("k") -> PoArr(Vector(PoBytes.fromString("b"), PoNum(1.5))))))),
    // JsonML markup node
    PoArr(Vector(PoStr("element"), PoObj("name" -> PoStr("foo")),
      PoStr("text node"),
      PoArr(Vector(PoStr("subel"), PoObj("name" -> PoStr("bar")))),
      PoStr("after text node")))
  ) ++ unicodeStrings.map(PoStr.apply)

  private def nanEqual(a: PoValue, b: PoValue): Boolean = (a, b) match {
    case (PoNum(x), PoNum(y)) if x.isNaN && y.isNaN => true
    case _ => a == b
  }

  private def roundtrips(codec: Codec, name: String): Unit =
    corpus.zipWithIndex.foreach { case (v, i) =>
      val back = codec.decode(codec.encode(v))
      assert(nanEqual(back, v), s"$name corpus[$i]: $v -> $back")
    }

  test("CBOR roundtrips the corpus")(roundtrips(CborCodec, "cbor"))
  test("JSON roundtrips the corpus")(roundtrips(JsonCodec, "json"))
  test("YAML roundtrips the corpus")(roundtrips(YamlCodec, "yaml"))
  test("XML roundtrips the corpus (pigeonmark:arbitrary)")(roundtrips(XmlCodec, "xml"))
  test("MsgPack roundtrips the corpus")(roundtrips(MsgPackCodec, "msgpack"))

  test("MsgPack wrapper semantics match the reference") {
    assert(MsgPackCodec.nameToExtID("set") == 72) // msgpack.js:64-66
    // undefined -> constant wrapper -> back
    assert(MsgPackCodec.decode(MsgPackCodec.encode(PoUndefined)) == PoUndefined)
    // a REAL {type,data} object survives via the '!' escape
    val real = PoObj("type" -> PoStr("Buffer"), "data" -> PoStr("x"))
    assert(MsgPackCodec.decode(MsgPackCodec.encode(real)) == real)
  }

  test("JS-literal encoder renders readable source (output-only codec)") {
    assert(JsCodec.encodeString(PoObj("a" -> PoInt(1), "b c" -> PoStr("x"))) ==
      "{a:1,'b c':'x'}")
    assert(JsCodec.encodeString(PoSet(PoInt(1), PoInt(2))) == "new Set([1,2])")
    assert(JsCodec.encodeString(PoMap.of(PoStr("k") -> PoInt(1))) ==
      "new Map([['k',1]])")
    assert(JsCodec.encodeString(PoDate(5L)) == "new Date(5)")
    assert(JsCodec.encodeString(PoBigInt(BigInt(7))) == "7n")
    assert(JsCodec.encodeString(PoNum(Double.NaN)) == "NaN")
  }

  test("XML: markup trees encode as markup, arbitrary data as the ns vocabulary") {
    val markup = PoArr(Vector(PoStr("root"),
      PoArr(Vector(PoStr("div"), PoObj("id" -> PoStr("yeah")), PoStr("no")))))
    assert(XmlCodec.encodeString(markup) == """<root><div id="yeah">no</div></root>""")
    assert(XmlCodec.decodeString("""<root><div id="yeah">no</div></root>""") == markup)
    val arb = XmlCodec.encodeString(PoObj("a" -> PoInt(1), "b" -> PoBool(true)))
    assert(arb ==
      """<object xmlns="pigeonmark:arbitrary"><number name="a">1</number><true name="b"/></object>""")
  }

  test("JSONL: one value per line, array framing") {
    val vals = PoArr(Vector(PoObj("a" -> PoInt(1)), PoStr("x"), PoSet(PoInt(1))))
    val bytes = JsonLinesCodec.encode(vals)
    val text = new String(bytes, "UTF-8")
    assert(text.count(_ == '\n') == 3)
    assert(JsonLinesCodec.decode(bytes) == vals)
  }

  test("JSON wrapper forms match the reference exactly") {
    assert(JsonCodec.encodeString(PoUndefined) == """{"type":"constant","data":"undefined"}""")
    assert(JsonCodec.encodeString(PoNum(Double.NaN)) == """{"type":"constant","data":"NaN"}""")
    assert(JsonCodec.encodeString(PoNum(Double.PositiveInfinity)) == """{"type":"constant","data":"infinity"}""")
    assert(JsonCodec.encodeString(PoNum(Double.NegativeInfinity)) == """{"type":"constant","data":"-infinity"}""")
    assert(JsonCodec.encodeString(PoBytes(Array[Byte](104, 105))) == """{"type":"Buffer","data":[104,105]}""")
    assert(JsonCodec.encodeString(PoSet(PoInt(1), PoInt(2))) == """{"type":"Set","data":[1,2]}""")
    assert(JsonCodec.encodeString(PoMap.of(PoStr("a") -> PoInt(1))) == """{"type":"Map","data":[["a",1]]}""")
    assert(JsonCodec.encodeString(PoDate(123L)) == """{"type":"Date","data":123}""")
    assert(JsonCodec.encodeString(PoBigInt(BigInt(7))) == """{"type":"BigInteger","data":"7"}""")
    // reviver ignores unknown wrapper types — stays a plain object
    assert(JsonCodec.decodeString("""{"type":"Mystery","data":1}""") ==
      PoObj("type" -> PoStr("Mystery"), "data" -> PoInt(1)))
    // a three-key object is never unwrapped
    assert(JsonCodec.decodeString("""{"type":"Set","data":[1],"x":2}""").isInstanceOf[PoObj])
  }

  test("JSON5-ish inputs decode via the lenient fallback (reference json5 path)") {
    assert(JsonCodec.decodeString("{a: 1, 'b': 'x', /* c */ d: 2,}") ==
      PoObj("a" -> PoInt(1), "b" -> PoStr("x"), "d" -> PoInt(2)))
    // strict JSON errors still surface when even the fallback fails
    intercept[Exception] { JsonCodec.decodeString("{{{") }
  }

  test("pretty print renders indented output") {
    val p = JsonCodec.print(PoObj("a" -> PoInt(1), "b" -> PoArr(Vector(PoInt(2)))))
    assert(p.contains("\n"))
    assert(JsonCodec.decodeString(p) ==
      PoObj("a" -> PoInt(1), "b" -> PoArr(Vector(PoInt(2)))))
  }

  test("Markup.setName renames tags and processing instructions (F7)") {
    import graft.markup.Markup
    val pi = PoArr(Vector(PoStr("?xml"), PoObj("version" -> PoStr("1.0"))))
    assert(Markup.setName(pi, "xml-stylesheet") ==
      PoArr(Vector(PoStr("?xml-stylesheet"), PoObj("version" -> PoStr("1.0")))))
    assert(Markup.setName(PoArr(Vector(PoStr("div"), PoStr("x"))), "span") ==
      PoArr(Vector(PoStr("span"), PoStr("x"))))
  }

  test("JSON numbers: integer fast path vs double, bigint beyond long") {
    assert(JsonCodec.decodeString("42") == PoInt(42))
    assert(JsonCodec.decodeString("42.0") == PoNum(42.0))
    assert(JsonCodec.decodeString("1e3") == PoNum(1000.0))
    assert(JsonCodec.encodeString(PoNum(2.0)) == "2.0") // PoNum round-trips as double
  }
}
