package graft.codec

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.markup.Markup

class HtmlCodecSpec extends AnyFunSuite {

  private def tag(nm: String, rest: PoValue*): PoValue = PoArr(PoStr(nm) +: rest.toVector)
  private def attrs(kvs: (String, String)*): PoValue =
    PoObj(scala.collection.immutable.VectorMap.from(kvs.map { case (k, v) => k -> (PoStr(v): PoValue) }))

  test("decode(toHTML(x)) == x for documents with doctype, attrs, voids") {
    val doc = tag("#document", attrs("doctype" -> "html"),
      tag("html",
        tag("head", tag("title", PoStr("T & T"))),
        tag("body", attrs("class" -> "a b"),
          tag("div", attrs("id" -> "yeah"), PoStr("no")),
          tag("img", attrs("src" -> "x.png")),
          tag("span", PoStr("cool")))))
    val html = Markup.toHTML(doc)
    assert(HtmlCodec.parse(html) == doc)
  }

  test("parses quoted, unquoted and bare attributes") {
    val p = HtmlCodec.parse("""<div id=plain title="two words" hidden>x</div>""")
    assert(Markup.attribute(p, "id").contains("plain"))
    assert(Markup.attribute(p, "title").contains("two words"))
    assert(Markup.attribute(p, "hidden").contains(""))
    assert(Markup.text(p) == "x")
  }

  test("void elements need no close; script text is raw") {
    val p = HtmlCodec.parse("<div><br><img src=a.png><script>if (a < b) x()</script></div>")
    val kids = Markup.childNodes(p)
    assert(kids.length == 3)
    assert(Markup.name(kids(0)).contains("br"))
    assert(Markup.text(kids(2)) == "if (a < b) x()")
  }

  test("entities and comments decode") {
    val p = HtmlCodec.parse("<p>a &lt;b&gt; &amp; &#65;&#x42;<!--note--></p>")
    assert(Markup.text(p) == "a <b> & AB")
    assert(Markup.childNodes(p).exists(n => Markup.getType(n).contains("comment")))
  }

  test("unclosed inner tags recover at the ancestor close (browser behavior)") {
    val p = HtmlCodec.parse("<ul><li>one<li>two</ul>")
    // the second <li> ends up nested under the first (no auto-close
    // heuristics) but parsing terminates correctly and text survives
    assert(Markup.name(p).contains("ul"))
    assert(Markup.text(p) == "onetwo")
  }

  test("encode rejects arbitrary data (reference: HTML cannot carry it)") {
    intercept[IllegalArgumentException] {
      HtmlCodec.encode(PoObj("a" -> PoInt(1)))
    }
    intercept[IllegalArgumentException] {
      HtmlCodec.encode(PoInt(5))
    }
  }
}
