package graft.markup

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** FIXTURES.md F7 — Markup API behavior pinned by the reference's
  * environment tests (test/test-workers-javascript-environment.js:6-60,
  * test-workers-javascript-lens.js:128-158). */
class MarkupSpec extends AnyFunSuite {

  private def tag(nm: String, rest: PoValue*): PoValue = PoArr(PoStr(nm) +: rest.toVector)
  private def attrs(kvs: (String, String)*): PoValue =
    PoObj(scala.collection.immutable.VectorMap.from(kvs.map { case (k, v) => k -> (PoStr(v): PoValue) }))

  // <root><div id="yeah">no</div><span>cool</span></root>
  private val doc = tag("root",
    tag("div", attrs("id" -> "yeah"), PoStr("no")),
    tag("span", PoStr("cool")))

  test("select #id, tag, [attr], descendant/child combinators (F7)") {
    assert(Markup.select(doc, "#yeah") ==
      Vector(tag("div", attrs("id" -> "yeah"), PoStr("no"))))
    assert(Markup.select(doc, "span") == Vector(tag("span", PoStr("cool"))))
    assert(Markup.select(doc, "root div").length == 1)
    assert(Markup.select(doc, "root > div").length == 1)
    assert(Markup.select(doc, "div > span").isEmpty)

    val html = tag("html",
      tag("head", tag("title", PoStr("t"))),
      tag("body", tag("a", attrs("href" -> "http://x"), PoStr("link")),
        tag("a", PoStr("no href"))))
    assert(Markup.select(html, "html") == Vector(html))
    assert(Markup.select(html, "a[href]").length == 1)
    assert(Markup.select(html, "head > title") == Vector(tag("title", PoStr("t"))))
    assert(Markup.select(html, "body title").isEmpty)
  }

  test("get.text concatenates descendant text; get.attribute reads (F7)") {
    assert(Markup.text(doc) == "nocool")
    assert(Markup.attribute(tag("div", attrs("id" -> "yeah"), PoStr("no")), "id")
      .contains("yeah"))
    assert(Markup.name(tag("div", attrs("id" -> "x"))).contains("div"))
    assert(Markup.getType(PoStr("hi")).contains("text"))
    assert(Markup.getType(doc).contains("tag"))
    assert(Markup.getType(attrs("a" -> "b")).contains("attributes"))
  }

  test("toXML: quoted attrs, nesting, self-closing empties (F7)") {
    assert(Markup.toXML(doc) ==
      """<root><div id="yeah">no</div><span>cool</span></root>""")
    assert(Markup.toXML(tag("br")) == "<br/>")
    assert(Markup.toXML(tag("t", PoStr("a<b&c>d"))) == "<t>a&lt;b&amp;c&gt;d</t>")
    assert(Markup.toXML(tag("t", attrs("q" -> "say \"hi\""))) ==
      """<t q="say &quot;hi&quot;"/>""")
  }

  test("toHTML: doctype, unquoted attrs where legal, void elements (F7)") {
    val html = tag("#document", attrs("doctype" -> "html"),
      tag("html",
        tag("div", attrs("id" -> "yeah"), PoStr("no")),
        tag("span", PoStr("cool"))))
    assert(Markup.toHTML(html) ==
      "<!DOCTYPE html>\n<html><div id=yeah>no</div><span>cool</span></html>")
    assert(Markup.toHTML(tag("img", attrs("src" -> "x.png"))) == "<img src=x.png>")
    assert(Markup.toHTML(tag("div", attrs("title" -> "two words"))) ==
      """<div title="two words"></div>""")
    intercept[IllegalArgumentException] {
      Markup.toHTML(tag("img", PoStr("child")))
    }
  }

  test("set variants: id, classList, attributes, text") {
    val d = tag("div")
    val d2 = Markup.setId(d, "x")
    assert(Markup.id(d2).contains("x"))
    val d3 = Markup.setClassList(d2, Seq("a", "b"))
    assert(Markup.classList(d3) == Seq("a", "b"))
    val d4 = Markup.setText(d3, "hello")
    assert(Markup.text(d4) == "hello")
    assert(Markup.childNodes(d4) == Vector(PoStr("hello")))
  }

  test("children vs childNodes; comments excluded from text") {
    val n = tag("root", PoStr("a"),
      PoArr(Vector(PoStr("#comment"), PoStr("hidden"))),
      tag("b", PoStr("c")))
    assert(Markup.childNodes(n).length == 3)
    assert(Markup.children(n) == Vector(tag("b", PoStr("c"))))
    assert(Markup.text(n) == "ac")
  }

  test("isPigeonMark light validation") {
    assert(Markup.isPigeonMark(doc))
    assert(Markup.isPigeonMark(PoStr("any string")))
    assert(!Markup.isPigeonMark(PoArr(Vector(PoStr("bad tag name!"), PoInt(1)))))
    assert(!Markup.isPigeonMark(PoInt(5)))
    assert(!Markup.isPigeonMark(PoArr(Vector(PoInt(1)))))
  }
}
