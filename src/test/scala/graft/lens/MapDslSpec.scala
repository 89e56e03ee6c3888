package graft.lens

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.JsonCodec
import graft.core._

/** The declarative map DSL (§2.4's HTTP-carriable form): golden-lens
  * semantics, the text/markup primitives, absent propagation, and
  * parse-time rejection of anything outside the grammar. */
class MapDslSpec extends AnyFunSuite {

  private def fn(json: String): MapFn =
    MapDsl.compile(JsonCodec.decodeString(json))

  private def runOn(f: MapFn, rid: String, data: PoValue): MapResult =
    MapRunner.run(f,
      MapPath(s"/datasets/a:d/records/$rid", "datasets", "a", "d", rid), data)

  private val goldenJson =
    """{
      |  "emit": [{"forEach": {"field": "tags"},
      |            "key": {"item": true},
      |            "value": {"set": [{"path": "recordID"}]}}],
      |  "log": {"field": "log"},
      |  "fail": {"field": "error"}
      |}""".stripMargin

  test("golden tag-index lens: emit per tag, log and throw on demand") {
    val f = fn(goldenJson)
    // plain record: outputs only (reference test-models-lens.js:39-53)
    val abc = runOn(f, "abc", PoObj("tags" -> PoArr(Vector(PoStr("cat"), PoStr("dog")))))
    assert(abc.outputs == Vector(
      "cat" -> PoSet(PoStr("abc")), "dog" -> PoSet(PoStr("abc"))))
    assert(abc.logs.isEmpty && abc.error.isEmpty)
    // log field present → console capture
    val defR = runOn(f, "def", PoObj(
      "tags" -> PoArr(Vector(PoStr("dog"), PoStr("mango"))),
      "log" -> PoStr("log test")))
    assert(defR.logs == Vector(LogEntry("log", Seq("log test"))))
    assert(defR.error.isEmpty)
    // error field present → throw AFTER emitting (outputs kept)
    val ghi = runOn(f, "ghi", PoObj(
      "tags" -> PoArr(Vector(PoStr("dog"), PoStr("cat"))),
      "error" -> PoStr("error test")))
    assert(ghi.outputs.map(_._1) == Vector("dog", "cat"))
    assert(ghi.error == Some(CapturedError("RuntimeException", "error test")))
  }

  test("absent fields: no emissions, no logs, no errors") {
    val f = fn(goldenJson)
    val r = runOn(f, "x", PoObj("other" -> PoInt(1)))
    assert(r.outputs.isEmpty && r.logs.isEmpty && r.error.isEmpty)
  }

  test("split/lower/concat build a token-index map") {
    val f = fn(
      """{"emit": [{"forEach": {"split": {"of": {"lower": {"field": "text"}},
        |                                 "on": "[^a-z0-9]+"}},
        |           "key": {"concat": [{"lit": "tok:"}, {"item": true}]},
        |           "value": {"set": [{"path": "recordID"}]}}]}""".stripMargin)
    val r = runOn(f, "r1", PoObj("text" -> PoStr("Hello, World! hello")))
    assert(r.outputs == Vector(
      "tok:hello" -> PoSet(PoStr("r1")), "tok:world" -> PoSet(PoStr("r1")),
      "tok:hello" -> PoSet(PoStr("r1"))))
  }

  test("markup select + text: index records by their <a> link text") {
    def tag(nm: String, rest: PoValue*): PoValue = PoArr(PoStr(nm) +: rest.toVector)
    val f = fn(
      """{"emit": [{"forEach": {"select": {"of": {"field": "doc"}, "css": "a"}},
        |           "key": {"text": {"item": true}},
        |           "value": {"arr": [{"path": "recordID"}]}}]}""".stripMargin)
    val doc = tag("body", tag("a", PoStr("x")), tag("div", tag("a", PoStr("y"))))
    val r = runOn(f, "r9", PoObj("doc" -> doc))
    assert(r.outputs == Vector(
      "x" -> PoArr(Vector(PoStr("r9"))), "y" -> PoArr(Vector(PoStr("r9")))))
  }

  test("sandbox preempts a hostile split regex; abandoned worker dies mid-regex") {
    // ~4 s of regex work on this JDK (bounded lookahead re-scanned at
    // every position — modern OpenJDK memoizes away the CLASSIC
    // exponential (a|a)+$ bombs, so the hostile case is expensive-
    // polynomial, which burns cores just as well)
    val f = fn(
      """{"emit": [{"forEach": {"split": {"of": {"field": "t"},
        |                                 "on": "(?=(a{0,5000}))b"}},
        |           "key": {"item": true}, "value": {"lit": 1}}]}""".stripMargin)
    val bomb = PoObj("t" -> PoStr("a" * 1000000))
    val t0 = System.nanoTime()
    val r = MapRunner.runSandboxed(f,
      MapPath("/datasets/a:d/records/x", "datasets", "a", "d", "x"),
      bomb, timeoutMs = 50)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(r.error.exists(_.errType == "MapTimeoutException"), r.error)
    assert(r.outputs.isEmpty) // isolate-kill semantics
    assert(elapsedMs < 3000, f"preemption took $elapsedMs%.0f ms")
    // the ABANDONED worker must die promptly too (InterruptibleChars):
    // java.util.regex never polls interrupts, so a plain String input
    // would leave the worker burning the remaining seconds of regex
    def busyWorkers(): Int = {
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.keySet.asScala.count(t =>
        t.getName == "graft-map-sandbox" && t.getState == Thread.State.RUNNABLE)
    }
    val deadline = System.nanoTime() + 2000000000L
    while (busyWorkers() > 0 && System.nanoTime() < deadline) Thread.sleep(20)
    assert(busyWorkers() == 0, "abandoned sandbox worker still burning the regex")
  }

  test("parse caps expression nesting (HTTP bodies are attacker-sized)") {
    // MaxDepth+2 nested lower() — must be an IllegalArgumentException
    // (→ 400 at the route), never a StackOverflowError
    val deep = ("""{"lower": """ * (MapDsl.MaxDepth + 2)) + """{"lit": 1}""" +
      ("}" * (MapDsl.MaxDepth + 2))
    val ex = intercept[IllegalArgumentException](
      fn(s"""{"emit": [{"key": $deep, "value": {"lit": 1}}]}"""))
    assert(ex.getMessage.contains("nesting"))
    // at-the-limit nesting still parses
    val ok = ("""{"lower": """ * (MapDsl.MaxDepth - 2)) + """{"lit": "X"}""" +
      ("}" * (MapDsl.MaxDepth - 2))
    val r = runOn(fn(s"""{"emit": [{"key": $ok, "value": {"lit": 1}}]}"""),
      "r", PoObj())
    assert(r.outputs == Vector("x" -> PoInt(1)))
  }

  test("parse rejects: unknown primitive, bad regex, missing key, empty spec") {
    def bad(json: String): Unit =
      intercept[IllegalArgumentException](fn(json))
    bad("""{"emit": [{"key": {"exec": "rm -rf"}, "value": {"lit": 1}}]}""")
    bad("""{"emit": [{"key": {"split": {"of": {"field": "t"}, "on": "("}},
          |           "value": {"lit": 1}}]}""".stripMargin)
    bad("""{"emit": [{"value": {"lit": 1}}]}""")
    bad("""{}""")
    bad("""[1,2]""")
    bad("""{"emit": [{"key": {"path": "hostname"}, "value": {"lit": 1}}]}""")
  }

  test("parse rejects garbage select selectors (same contract as split's regex)") {
    def bad(css: String): Unit =
      intercept[IllegalArgumentException](fn(
        s"""{"emit": [{"key": {"text": {"select": {"css": "$css"}}},
           |            "value": {"lit": 1}}]}""".stripMargin))
    bad("{]]")          // not a selector at all
    bad("a >")          // trailing combinator
    bad("> a")          // leading combinator
    bad("a[unclosed")   // malformed attribute selector
    bad(",,")           // only commas
    // well-formed selectors still parse
    fn("""{"emit": [{"key": {"text": {"select": {"css": "div.x > a[href], #id b"}}},
         |           "value": {"lit": 1}}]}""".stripMargin)
  }
}
