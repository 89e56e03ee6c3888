package graft.tools

import graft.core._
import graft.js._
import graft.lens.{JsMapFn, MapContext, MapPath}

/** Micro-probe for the per-record cost split of a JS lens map call
  * (VERDICT r17 Next #7): per-record global-environment construction
  * ([[Builtins.makeGlobals]] + console/output/path wiring) vs the map
  * body's actual interpretation. Run: `sbt "runMain graft.tools.JsEnvProbe"`.
  * Single-threaded, JIT-warmed, wall-clock per phase over N calls. */
object JsEnvProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(20000)

    // 1. makeGlobals alone
    def timeIt(tag: String)(body: () => Unit): Unit = {
      var i = 0
      while (i < n / 10) { body(); i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { body(); i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"JSENV $tag%-28s ${us}%8.1f us/call  (n=$n)")
    }

    var sink: Any = null
    timeIt("makeGlobals") { () =>
      var interpRef: Interp = null
      sink = Builtins.makeGlobals(() => interpRef, Seq.empty)
    }

    // 2. a full map call with a typical async body (the q150 shape)
    val asyncBody =
      """
      |async function tok(t) { return t.toLowerCase().split(/[^a-z0-9]+/).filter(s => s.length > 0) }
      |async function run() {
      |  const toks = await tok(data.text)
      |  const seen = {}
      |  for (const t of toks) { if (!seen[t]) { seen[t] = true; output(t, [path.recordID]) } }
      |}
      |run()
      |""".stripMargin
    val fn = JsMapFn.compile(asyncBody).toOption.get
    val data = PoObj("text" -> PoStr("The quick brown fox jumps over the lazy dog near the river bank"))
    def ctx(): MapContext = new MapContext(
      MapPath("/datasets/a:docs/records/r1", "datasets", "a", "docs", "r1"), data,
      graft.lens.MapRunner.NoTimeoutMs)
    timeIt("full map call (async body)") { () =>
      val c = ctx(); fn.map(c); sink = c
    }

    // 3. trivial body — isolates fixed per-call overhead (env + parse-reuse
    //    + scope setup) from body interpretation
    val trivial = JsMapFn.compile("output('k', 1)").toOption.get
    timeIt("full map call (trivial)") { () =>
      val c = ctx(); trivial.map(c); sink = c
    }
    if (sink == null) println("?")
  }
}
