package graft.markup

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.HtmlCodec
import graft.core._

/** The reference environment suite's golden HTML document, end to end:
  * decode → select → get.text → toHTML → toXML, each pinned to the
  * EXACT strings the reference asserts
  * (test/test-workers-javascript-environment.js:6-121). This crosses
  * the HTML codec and the Markup library in one pipeline — whitespace,
  * comments, unquoted-attribute serialization and void elements all
  * have to line up byte-for-byte. */
class MarkupGoldenDocSpec extends AnyFunSuite {

  private val testDocumentText =
    """<!DOCTYPE html>
      |<html>
      |<head><title>Wonderful World of Signs</title></head>
      |<body>
      |  <div id="heading">
      |    <a href="http://signs.com/">Signs Homepage</a>
      |  </div>
      |  <article>
      |    <p>Hello there!</p>
      |    <img src="foo.png"/>
      |    <a href="/next">Next Page</a>
      |    <!-- just a silly comment -->
      |  </article>
      |</body>
      |</html>""".stripMargin

  private val testDocument = HtmlCodec.parse(testDocumentText)

  private def el(nm: String, rest: PoValue*): PoValue = PoArr(PoStr(nm) +: rest.toVector)
  private def attrs(kvs: (String, String)*): PoValue =
    PoObj(scala.collection.immutable.VectorMap.from(kvs.map { case (k, v) => k -> (PoStr(v): PoValue) }))

  test("select 'html' finds the root element of the decoded document") {
    val hits = Markup.select(testDocument, "html")
    assert(hits.length == 1)
    // the document node is ['#document', {doctype}, <html>] — the hit
    // IS that child, not a copy (reference: deep-equals testDocument[2])
    assert(hits.head == testDocument.asInstanceOf[PoArr].items(2))
  }

  test("select 'a[href]' finds both links in reference element shape") {
    assert(Markup.select(testDocument, "a[href]") == Seq(
      el("a", attrs("href" -> "http://signs.com/"), PoStr("Signs Homepage")),
      el("a", attrs("href" -> "/next"), PoStr("Next Page"))))
  }

  test("select 'head > title' finds the title (attr-less shorthand shape)") {
    assert(Markup.select(testDocument, "head > title") ==
      Seq(el("title", PoStr("Wonderful World of Signs"))))
  }

  test("get.text concats the strings of the whole document, exactly") {
    assert(Markup.text(testDocument) == Seq(
      "\nWonderful World of Signs\n\n",
      "  \n",
      "    Signs Homepage\n",
      "  \n",
      "  \n",
      "    Hello there!\n",
      "    \n",
      "    Next Page\n",
      "    \n",
      "  \n",
      "\n").mkString)
    assert(Markup.text(Markup.select(testDocument, "title").head) ==
      "Wonderful World of Signs")
  }

  test("get.attribute works on selected and hand-crafted elements") {
    assert(Markup.attribute(Markup.select(testDocument, "a").head, "href")
      .contains("http://signs.com/"))
    assert(Markup.attribute(el("test-element", attrs("val" -> "just a test")), "val")
      .contains("just a test"))
  }

  test("toHTML serializes the golden document exactly") {
    assert(Markup.toHTML(testDocument) == Seq(
      "<!DOCTYPE html>\n",
      "<html>\n",
      "<head><title>Wonderful World of Signs</title></head>\n",
      "<body>\n",
      "  <div id=heading>\n",
      "    <a href=http://signs.com/>Signs Homepage</a>\n",
      "  </div>\n",
      "  <article>\n",
      "    <p>Hello there!</p>\n",
      "    <img src=foo.png>\n",
      "    <a href=/next>Next Page</a>\n",
      "    <!-- just a silly comment -->\n",
      "  </article>\n",
      "</body>\n",
      "</html>").mkString)
  }

  test("toXML round-trips to the original text, byte for byte") {
    assert(Markup.toXML(testDocument) == testDocumentText)
  }

  test("toHTML/toXML throw on bad JsonML and impossible HTML") {
    for (bad <- Seq[PoValue](PoBool(false),
      PoArr(Vector(PoInt(1), PoInt(2), PoInt(3))),
      el("tag", PoArr(Vector(PoInt(1), PoInt(2), PoInt(3)))))) {
      intercept[IllegalArgumentException](Markup.toHTML(bad))
      intercept[IllegalArgumentException](Markup.toXML(bad))
    }
    // a void element cannot carry children in HTML
    intercept[IllegalArgumentException](
      Markup.toHTML(el("img", attrs("src" -> "foo.jpg"), el("child"))))
  }
}
