package graft.js

/** V8-differential probe harness — how the round-7 JsConformanceSpec
  * rows were produced. Workflow:
  *  1. write candidate expressions (one per line) to a file;
  *  2. evaluate each in node (`'' + (expr)`, exceptions as
  *     `THROW:<ctor>`) emitting `["expr","result"]` JSON lines to
  *     `/tmp/probe_v8.jsonl`;
  *  3. `Test/runMain graft.js.JsProbeRunner` runs the same
  *     expressions through the interpreter and prints every DIFF.
  * Not a test (node is an environment tool, not a build dependency) —
  * divergences it finds get fixed and then PINNED as ordinary
  * conformance rows with the V8 output inlined. */
object JsProbeRunner {
  def main(args: Array[String]): Unit = {
    // probe file as arg (default kept for the documented workflow) —
    // the runner used to ignore args entirely, silently re-running
    // whatever /tmp/probe_v8.jsonl held
    val path = args.headOption.getOrElse("/tmp/probe_v8.jsonl")
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    var same = 0
    lines.foreach { line =>
      // minimal 2-string JSON array parse
      val arr = ujsonParse(line)
      val (expr, want) = (arr(0), arr(1))
      // async probes (asyncgen.js): the program is an async IIFE —
      // settle it through .then and let the worker's drain-to-quiescence
      // deliver the output; rejections label like node's catch
      val template =
        if (expr.startsWith("(async"))
          s"($expr).then(v => output('r', '' + v), e => output('r', 'THROW:' + ((e && e.name) || ('' + e))))"
        else s"output('r', '' + ($expr))"
      val got = try {
        val fn = graft.lens.JsMapFn.compile(template) match {
          case Right(f) => f
          case Left(err) => null
        }
        if (fn == null) "STARTUP_ERR"
        else {
          val res = graft.lens.MapRunner.run(fn,
            graft.lens.MapPath("/datasets/a:n/records/r", "datasets", "a", "n", "r"),
            graft.core.PoObj.empty)
          res.error match {
            case Some(e) => "THROW:" + e.errType
            case None => res.outputs.headOption match {
              case Some((_, graft.core.PoStr(s))) => s
              case other => "NO_OUTPUT:" + other
            }
          }
        }
      } catch { case e: Throwable => "CRASH:" + e.getClass.getSimpleName + ":" + e.getMessage }
      // STARTUP_ERR vs THROW:SyntaxError is the same loudness class:
      // node's eval throws at parse where the worker contract reports a
      // startup error — both are a loud rejection of illegal source
      // (README residual), so the probe equates the labels.
      if (got == want || (got == "STARTUP_ERR" && want == "THROW:SyntaxError")) same += 1
      else println(s"DIFF  $expr\n  v8    = $want\n  graft = $got")
    }
    println(s"MATCH $same/${lines.size}")
  }

  private def ujsonParse(line: String): Seq[String] = {
    // ["expr","out"] with standard JSON escapes
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var i = line.indexOf('"')
    while (i >= 0 && i < line.length) {
      val sb = new StringBuilder
      i += 1
      var done = false
      while (!done) {
        line(i) match {
          case '\\' =>
            line(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case 'u' =>
                sb.append(Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case c => sb.append(c); i += 2
            }
          case '"' => done = true; i += 1
          case c => sb.append(c); i += 1
        }
      }
      buf += sb.toString
      i = line.indexOf('"', i)
      // skip separators: find next quote that starts a string
    }
    buf.toSeq
  }
}
