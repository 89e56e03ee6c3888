package graft

/** Single-query bench loop (FIXTURES.md): warmup + min-of-3 on one
  * SparkEntry query at sf0.1 — the fast iteration tool between full
  * Bench runs. `SPARK_GRAFT_JOBLOG=1` additionally prints one line per
  * Spark job (duration + call site) during the LAST timed run — the
  * job-count profile that tells small-job-overhead floors (q44) apart
  * from data-volume costs. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val joblog = sys.env.get("SPARK_GRAFT_JOBLOG").contains("1")
    // SPARK_GRAFT_BENCH_REPS: same knob as Bench — deeper reps reach
    // JIT steady state (the q40 lesson: ~10 executions for the
    // percentile path; min-of-3 lands wherever warm-up left it)
    val reps = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(if (joblog) 2 else 3))
    val times = (1 to reps).map(_ => run())
    val profiled = if (joblog) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.map(s => s.name.takeWhile(_ != '\n').take(60))
            .distinct.mkString(" | ").take(240)
          val ntasks = j.stageInfos.map(_.numTasks).sum
          starts.put(j.jobId, (System.nanoTime(), s"tasks=$ntasks  $site"))
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
            System.err.println(f"JOBLOG ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $site")
          }
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val run = for {a <- i.submissionTime; b <- i.completionTime} yield b - a
          System.err.println(f"STAGELOG ${i.stageId}%4d run=${run.getOrElse(-1L)}%6d ms tasks=${i.numTasks} exec=${i.taskMetrics.executorRunTime} ms  ${i.name.takeWhile(_ != '\n').take(80)}")
        }
      })
      Seq(run())
    } else Seq.empty
    val all = times ++ profiled
    println(f"BENCHONE $name min=${all.min}%.2f runs=${all.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
