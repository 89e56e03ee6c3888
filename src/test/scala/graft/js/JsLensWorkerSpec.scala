package graft.js

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.lens._

/** Mirror of the reference's JS lens worker contract tests
  * (reference: test/test-workers-javascript-lens.js and the isolate
  * environment RPC suite at the bottom of that file) — the acceptance
  * bar for `mapType: 'javascript'`. */
class JsLensWorkerSpec extends AnyFunSuite with Matchers {

  /** the reference's testCode verbatim (test-workers-javascript-lens.js:9-17) */
  private val testCode =
    """// this is my test map code
      |// it should output five things, a, b, and c c c
      |output('a', 1)
      |output('b', 2)
      |output('c', data.v)
      |output('c', data.v)
      |output('c', data.v)
      |if (data.plzlog) console.log(data.plzlog)
      |if (data.plzthrow) throw new Error(data.plzthrow)""".stripMargin

  private def mapWith(fn: JsMapFn, data: PoValue): MapResult =
    MapRunner.run(fn, MapPath("/datasets/author:name/records/recordID",
      "datasets", "author", "name", "recordID"), data)

  test("startup catches code syntax errors (testCode + 'yield 5')") {
    val startup = JsMapFn.compile(testCode + "\nyield 5")
    startup.isLeft shouldBe true
  }

  test("starts up correctly with good code") {
    JsMapFn.compile(testCode).isRight shouldBe true
  }

  test("maps correctly (reference: 'maps correctly')") {
    val fn = JsMapFn.compile(testCode).toOption.get
    val result = mapWith(fn, PoObj("foo" -> PoStr("bar"), "v" -> PoStr("yehaw")))
    result.outputs shouldBe Vector(
      "a" -> PoInt(1),
      "b" -> PoInt(2),
      "c" -> PoStr("yehaw"),
      "c" -> PoStr("yehaw"),
      "c" -> PoStr("yehaw"))
    result.logs shouldBe empty
    result.error shouldBe None
  }

  test("a modern class-based lens runs through the worker contract (r8)") {
    // classes + fields + accessors + toJSON through the REAL lens
    // surface: compile → map(path, data) → captured outputs
    val code =
      """class TokenStats {
        |  counts = {}
        |  total = 0
        |  add(tok) {
        |    this.counts[tok] = (this.counts[tok] || 0) + 1
        |    this.total += 1
        |  }
        |  get distinct() { return Object.keys(this.counts).length }
        |  toJSON() { return { total: this.total, distinct: this.distinct } }
        |}
        |class WeightedStats extends TokenStats {
        |  add(tok) { super.add(tok); if (tok.length > 3) super.add(tok) }
        |}
        |const s = new WeightedStats()
        |for (const t of data.text.toLowerCase().split(/[^a-z0-9]+/)) {
        |  if (t) s.add(t)
        |}
        |output(path.recordID, JSON.parse(JSON.stringify(s)))""".stripMargin
    val fn = JsMapFn.compile(code).toOption.get
    val result = mapWith(fn, PoObj("text" -> PoStr("the cat saw the kitten")))
    // the>3? no (len 3): counted once ×2; cat once; saw once; kitten ×2
    result.error shouldBe None
    result.outputs match {
      case Vector((_, PoObj(fields))) =>
        fields.get("total") shouldBe Some(PoInt(6L))
        fields.get("distinct") shouldBe Some(PoInt(4L))
      case other => fail(s"unexpected outputs: $other")
    }
  }

  test("logs from maps and catches throws (outputs before the throw are kept)") {
    val fn = JsMapFn.compile(testCode).toOption.get
    val result = mapWith(fn, PoObj(
      "foo" -> PoStr("bar"), "v" -> PoStr("yehaw"),
      "plzthrow" -> PoStr("nice"), "plzlog" -> PoStr("hey")))
    result.logs should have length 1
    result.logs.head.args shouldBe Seq("hey")
    result.error.get.message shouldBe "nice"
    result.error.get.errType shouldBe "Error"
    // reference keeps pre-throw outputs (MapResult scaladoc / golden lens)
    result.outputs should have length 5
  }

  // ---- the reference's environment RPC suite: reach the env API through
  // `segments.reduce((a, b) => a[b], global)(...data)` ----

  private val rpcCode =
    """// rpc receiver code to reach inside the js vm and poke at it's internal APIs from the outside
      |const segments = path.recordID.split('.')
      |output('result', segments.reduce((a, b) => a[b], global)(...data))
      |""".stripMargin

  private def rpc(cmdPath: String, args: PoValue*): PoValue = {
    val fn = JsMapFn.compile(rpcCode) match {
      case Right(f) => f
      case Left(e) => fail(s"rpc startup: ${e.message}")
    }
    val res = MapRunner.run(fn, MapPath(s"/datasets/test:test/records/$cmdPath",
      "datasets", "test", "test", cmdPath), PoArr(args.toVector))
    res.error.foreach(e => fail(s"rpc error: ${e.errType}: ${e.message}"))
    res.outputs.collectFirst { case ("result", v) => v }.getOrElse(PoUndefined)
  }

  /** codec.xml.decode('<root><div id="yeah">no</div><span>cool</span></root>')
    * in PigeonMark JsonML form */
  private val xmlDoc: PoValue =
    PoArr(Vector(PoStr("root"), PoObj.empty,
      PoArr(Vector(PoStr("div"), PoObj("id" -> PoStr("yeah")), PoStr("no"))),
      PoArr(Vector(PoStr("span"), PoObj.empty, PoStr("cool")))))

  test("ivm environment: Markup.select()") {
    rpc("Markup.select", xmlDoc, PoStr("#yeah")) shouldBe
      PoArr(Vector(PoArr(Vector(PoStr("div"), PoObj("id" -> PoStr("yeah")), PoStr("no")))))
  }

  test("ivm environment: Markup.get.text()") {
    val doc = PoArr(Vector(PoStr("root"), PoObj.empty,
      PoArr(Vector(PoStr("div"), PoObj("id" -> PoStr("yeah")), PoStr("no"))),
      PoArr(Vector(PoStr("span"), PoObj.empty, PoStr("cool")))))
    rpc("Markup.get.text", doc) shouldBe PoStr("nocool")
  }

  test("ivm environment: Markup.get.attribute()") {
    val el = PoArr(Vector(PoStr("div"), PoObj("id" -> PoStr("yeah")), PoStr("no")))
    rpc("Markup.get.attribute", el, PoStr("id")) shouldBe PoStr("yeah")
  }

  test("ivm environment: Markup.toXML()") {
    val doc = PoArr(Vector(PoStr("root"), PoObj.empty,
      PoArr(Vector(PoStr("div"), PoObj("id" -> PoStr("yeah")), PoStr("no"))),
      PoArr(Vector(PoStr("span"), PoObj.empty, PoStr("cool")))))
    rpc("Markup.toXML", doc) shouldBe PoStr("""<root><div id="yeah">no</div><span>cool</span></root>""")
  }

  test("ivm environment: Markup.toHTML()") {
    // the reference's exact document, including the attr-less JsonML
    // shorthand forms (test-workers-javascript-lens.js:147-152)
    val doc = PoArr(Vector(PoStr("#document"), PoObj("doctype" -> PoStr("html")),
      PoArr(Vector(PoStr("html"),
        PoArr(Vector(PoStr("div"), PoObj("id" -> PoStr("yeah")), PoStr("no"))),
        PoArr(Vector(PoStr("span"), PoStr("cool")))))))
    rpc("Markup.toHTML", doc) shouldBe
      PoStr("<!DOCTYPE html>\n<html><div id=yeah>no</div><span>cool</span></html>")
  }

  test("global is self-referential and carries the API") {
    val fn = JsMapFn.compile(
      """output('selfRef', global.global === global)
        |output('hasOutput', typeof global.output === 'function')
        |output('hasConsole', typeof global.console === 'object')
        |""".stripMargin).toOption.get
    val res = mapWith(fn, PoObj.empty)
    res.error shouldBe None
    res.outputs.toMap.apply("selfRef") shouldBe PoBool(true)
    res.outputs.toMap.apply("hasOutput") shouldBe PoBool(true)
    res.outputs.toMap.apply("hasConsole") shouldBe PoBool(true)
  }

  test("console is frozen, as in the reference isolate") {
    val fn = JsMapFn.compile(
      """console.log = 'clobbered'
        |console.log('still works')
        |""".stripMargin).toOption.get
    val res = mapWith(fn, PoObj.empty)
    res.error shouldBe None
    res.logs.map(_.args) shouldBe Vector(Seq("still works"))
  }

  test("the golden tag-index lens body runs (test-models-lens.js:31-35)") {
    val goldenCode =
      "for (const tag of data.tags) output(tag, new Set([path.recordID]))\n" +
      "if (data.log) console.log(data.log)\n" +
      "if (data.error) throw new Error(data.error)\n"
    val fn = JsMapFn.compile(goldenCode).toOption.get

    // record abc: plain tags
    val abc = MapRunner.run(fn, MapPath("/datasets/system:test-dataset/records/abc",
      "datasets", "system", "test-dataset", "abc"),
      PoObj("tags" -> PoArr(Vector(PoStr("cat"), PoStr("dog")))))
    abc.error shouldBe None
    abc.outputs shouldBe Vector(
      "cat" -> PoSet(PoStr("abc")),
      "dog" -> PoSet(PoStr("abc")))

    // record def: logs, still outputs
    val dEf = MapRunner.run(fn, MapPath("/datasets/system:test-dataset/records/def",
      "datasets", "system", "test-dataset", "def"),
      PoObj("tags" -> PoArr(Vector(PoStr("dog"), PoStr("mango"))), "log" -> PoStr("log test")))
    dEf.logs.map(_.args) shouldBe Vector(Seq("log test"))
    dEf.outputs should have length 2

    // record ghi: throws AFTER emitting — outputs retained, error captured
    val ghi = MapRunner.run(fn, MapPath("/datasets/system:test-dataset/records/ghi",
      "datasets", "system", "test-dataset", "ghi"),
      PoObj("tags" -> PoArr(Vector(PoStr("dog"), PoStr("cat"))), "error" -> PoStr("error test")))
    ghi.error.get.errType shouldBe "Error"
    ghi.error.get.message shouldBe "error test"
    ghi.outputs shouldBe Vector(
      "dog" -> PoSet(PoStr("ghi")),
      "cat" -> PoSet(PoStr("ghi")))
  }

  test("sandboxed execution preempts a compute-only runaway JS map") {
    val fn = JsMapFn.compile("while (true) { Math.sqrt(2) }").toOption.get
    val res = MapRunner.runSandboxed(fn,
      MapPath("/datasets/a:b/records/r", "datasets", "a", "b", "r"),
      PoObj.empty, timeoutMs = 50L)
    res.error.isDefined shouldBe true
    // either the deadline hook or the preemptive monitor got it first —
    // both are budget kills, neither is catchable by the lens
    Set("MapTimeoutException", "JsBudgetExceeded") should contain(res.error.get.errType)
  }
}
