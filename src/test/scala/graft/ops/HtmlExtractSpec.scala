package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** HTML main-content extraction: selector-first strategy, density
  * fallback, failure containment, and the DataFrame wrapper. */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("selector wins: <main> text extracted, nav/footer dropped") {
    val html = "<html><head><title>T1</title></head><body>" +
      "<nav><a href=\"/a\">n1</a><a href=\"/b\">n2</a></nav>" +
      "<main><p>the real article text</p></main>" +
      "<footer>boilerplate</footer></body></html>"
    val (main, links, title) = HtmlExtract.extract(html)
    assert(main == "the real article text")
    assert(links == 2)
    assert(title == "T1")
  }

  test("id selector #content matches when no main/article exists") {
    val html = "<body><div id=\"content\">picked</div><div>not picked but longer text here</div></body>"
    val (main, _, _) = HtmlExtract.extract(html)
    assert(main == "picked")
  }

  test("density fallback: longest p/div/td block wins when no selector matches") {
    val html = "<body><div>short</div><p>this paragraph is clearly the longest block of text</p><td>tiny</td></body>"
    val (main, _, title) = HtmlExtract.extract(html)
    assert(main == "this paragraph is clearly the longest block of text")
    assert(title == "")
  }

  test("density fallback: nested ancestor block keeps its full subtree text") {
    // The outer div's subtree text is the longest match, so it wins over
    // its own children — pinning that the one-pass length computation
    // scores SUBTREE text (old maxBy semantics), not direct text only.
    val html = "<body><div><p>first part</p><p>second part</p></div><p>a shorter standalone</p></body>"
    val (main, _, _) = HtmlExtract.extract(html)
    assert(main == "first partsecond part")
  }

  test("density fallback is linear on pathological nesting depth") {
    // depth-D nested <div>s, each level carrying text: the pre-fix code
    // assembled every ancestor's subtree text (O(D*n) chars — ~3 GB of
    // string churn at this size); the one-pass version walks once.
    val depth = 4000
    val sb = new StringBuilder("<body>")
    (0 until depth).foreach { i => sb.append("<div>t").append(i % 10) }
    (0 until depth).foreach { _ => sb.append("</div>") }
    sb.append("</body>")
    val t0 = System.nanoTime()
    val (main, _, _) = HtmlExtract.extract(sb.toString)
    val secs = (System.nanoTime() - t0) / 1e9
    val expected = (0 until depth).map(i => "t" + (i % 10)).mkString
    assert(main == expected)
    assert(secs < 10.0, f"nested-depth extract took $secs%.1f s — not linear")
  }

  test("no blocks at all: whole-tree text fallback") {
    val (main, _, _) = HtmlExtract.extract("<body><span>just a span</span></body>")
    assert(main == "just a span")
  }

  test("mainContent DataFrame round-trips text exactly and counts links") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<html><head><title>A</title></head><body><main><p>alpha text</p></main></body></html>"),
      (2L, "<html><body><nav><a href=\"/x\">x</a></nav><article>beta text</article></body></html>"))
      .toDF("doc_id", "html")
    val got = HtmlExtract.mainContent(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq((1L, "alpha text", 0, "A"), (2L, "beta text", 1, "")))
  }
}
