package graft.tools

import graft.GraftSession

/** Micro-bench for the winnowing gram-hash decision (VERDICT r8 #1/#4):
  * times ONLY the fingerprint stage (noop sink, no agg/sort) for both
  * gram hashes over the sf documents corpus, min-of-N. This isolates
  * the per-position hash cost that the q75/q78 end-to-end numbers
  * dilute with the groupBy+orderBy tail.
  *
  * Run: sbt "runMain graft.tools.WinnowBench" (SPARK_GRAFT_SF_DIR to
  * override the corpus, SPARK_GRAFT_BENCH_REPS the reps).
  */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(5)
    val spark = GraftSession.build()
    // --long: ×16 the text per doc (web-page length instead of the sf
    // corpus's short snippets) so per-row overhead stops masking the
    // per-gram hash cost — the regime 100 TB crawl docs live in
    val longDocs = args.contains("--long")
    val base = graft.Tables.load(spark, sfDir, "documents")
    val docs =
      if (longDocs)
        base.withColumn("text",
          org.apache.spark.sql.functions.concat_ws(" ",
            org.apache.spark.sql.functions.array_repeat(
              org.apache.spark.sql.functions.col("text"), 16)))
      else base

    def time(mode: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.ops.TextOps.winnowingFingerprints(docs, k = 5, w = 4, gramHash = mode)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      (1 to reps).map(_ => once()).min
    }

    val sha = time("sha256")
    val xx = time("xx64")
    println(f"""{"winnow_fp_stage":{"sha256_sec":$sha%.3f,"xx64_sec":$xx%.3f,"speedup":${sha / xx}%.2f,"long_docs":$longDocs,"sf":"$sfDir"}}""")
    spark.stop()
  }
}
