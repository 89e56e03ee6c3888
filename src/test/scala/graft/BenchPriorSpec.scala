package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-healing bench's PRIOR must come from the previous round's
  * committed artifact, not a same-session run (VERDICT r16 "what's
  * wrong" #1: a mid-session prior absorbed an 18% cross-round level
  * shift). These pin the dense-"wj"-line decoder: positional decode
  * over the alpha name order, guarded by the embedded nck CRC so a
  * changed query set rejects rather than mis-attributes. */
class BenchPriorSpec extends AnyFunSuite {

  private def nck(names: Seq[String]): String = {
    val crc = new java.util.zip.CRC32
    crc.update(names.sorted.mkString(",").getBytes("UTF-8"))
    f"${crc.getValue & 0xffff}%04x"
  }

  /** a round artifact as the driver writes it: the wj line JSON-escaped
    * inside a "tail" string field */
  private def artifact(names: Seq[String], wCs: Seq[Int], sf: String,
                       guard: Option[String] = None): String = {
    val alpha = names.sorted
    val line =
      s"""{"metric":"total","value":1.0,"unit":"sec","part":"wj","n_queries":${alpha.size},""" +
        s""""order":"alpha","first":"${alpha.head}","last":"${alpha.last}",""" +
        s""""nck":"${guard.getOrElse(nck(names))}","wenc":"cs","jenc":"pct",""" +
        s""""w":[${wCs.mkString(",")}],"j":[${wCs.map(_ => 90).mkString(",")}],"sf":"$sf"}"""
    val esc = line.replace("\"", "\\\"")
    s"""{"n": 16, "sf": 0.1, "tail": "\\n$esc\\n$esc\\n"}"""
  }

  private val names = Seq("q2_join", "q1_agg", "q10_dedup")

  test("decodes walls positionally over the alpha order, centiseconds to seconds") {
    val raw = artifact(names, Seq(212, 64, 1333), "/root/testdata/sf0.1")
    val got = BenchPrior.decodeWjLine(raw, "/root/testdata/sf0.1", names)
    // alpha order: q10_dedup, q1_agg, q2_join
    assert(got.contains(Map(
      "q10_dedup" -> 2.12, "q1_agg" -> 0.64, "q2_join" -> 13.33)))
  }

  test("rejects on sf mismatch (a sf1.0 SCALING artifact must not seed sf0.1 priors)") {
    val raw = artifact(names, Seq(1, 2, 3), "/root/testdata/sf1.0")
    assert(BenchPrior.decodeWjLine(raw, "/root/testdata/sf0.1", names).isEmpty)
  }

  test("rejects on name-set drift via the nck guard (renamed/added query)") {
    val raw = artifact(names, Seq(1, 2, 3), "/root/testdata/sf0.1")
    assert(BenchPrior.decodeWjLine(
      raw, "/root/testdata/sf0.1", names :+ "q99_new").isEmpty)
    val wrongGuard = artifact(names, Seq(1, 2, 3), "/root/testdata/sf0.1",
      guard = Some("0000"))
    assert(BenchPrior.decodeWjLine(wrongGuard, "/root/testdata/sf0.1", names).isEmpty)
  }

  test("rejects a truncated w array (tail window clipped the line)") {
    val raw = artifact(names, Seq(1, 2), "/root/testdata/sf0.1")
    assert(BenchPrior.decodeWjLine(raw, "/root/testdata/sf0.1", names).isEmpty)
  }

  test("decodes the r18+ plain queries line by unique qNN prefix") {
    val line =
      """{"metric":"total","value":16.09,"unit":"sec","job_total":15.0,""" +
        """"med_total":16.5,"reps":3,"n_queries":3,"part":"queries",""" +
        """"queries":{"q1":0.64,"q2":2.12,"q10":13.33},""" +
        """"cross_round_movers":{},"errors":{},"sf":"/root/testdata/sf0.1"}"""
    val esc = line.replace("\"", "\\\"")
    val raw = s"""{"n": 18, "tail": "\\n$esc\\n"}"""
    val got = BenchPrior.decodeQueriesLine(raw, "/root/testdata/sf0.1", names)
    assert(got.contains(Map(
      "q1_agg" -> 0.64, "q2_join" -> 2.12, "q10_dedup" -> 13.33)))
    // sf mismatch rejects
    assert(BenchPrior.decodeQueriesLine(raw, "/root/testdata/sf1.0", names).isEmpty)
    // an unknown qNN key rejects the whole line (no mis-attribution)
    assert(BenchPrior.decodeQueriesLine(
      raw, "/root/testdata/sf0.1", Seq("q1_agg", "q2_join")).isEmpty)
    // ambiguous prefix rejects
    assert(BenchPrior.decodeQueriesLine(
      raw, "/root/testdata/sf0.1", names :+ "q10_other").isEmpty)
  }

  test("decodes the real committed BENCH_r16.json against the live registry") {
    val p = java.nio.file.Paths.get("BENCH_r16.json")
    assume(java.nio.file.Files.isRegularFile(p))
    val raw = java.nio.file.Files.readString(p)
    val live = SparkEntry.queries.keys.toSeq
    val got = BenchPrior.decodeWjLine(raw, "/root/testdata/sf0.1", live)
    got match {
      case Some(m) =>
        assert(m.size == live.size)
        // spot-check two values against the r16 BENCH_LATEST map
        assert(math.abs(m("q100_dsir_scores") - 2.12) < 0.011)
        assert(m.values.forall(v => v >= 0 && v < 1000))
      case None =>
        // legal only if the query set changed since r16 — assert that
        // is actually the case rather than silently passing
        val crc = new java.util.zip.CRC32
        crc.update(live.sorted.mkString(",").getBytes("UTF-8"))
        assert(!raw.contains(f""""nck":"${crc.getValue & 0xffff}%04x""""),
          "decoder returned None even though the nck guard matches the live registry")
    }
  }
}
