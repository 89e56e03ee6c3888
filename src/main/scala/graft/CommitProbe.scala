package graft

import graft.core._
import graft.lens.{Lens, MapContext, MapFn}
import graft.store.{DataPath, Store}

/** JOB CENSUS for the lens-build fixed cost (VERDICT r15 Next #3):
  * q153/q138/q159/q146 are dominated by per-build/per-commit fixed
  * Spark jobs — ~1 s per build at ANY scale factor. This probe names
  * every job three build shapes schedule, so the removable ones can be
  * eliminated instead of guessed at:
  *   A. EMPTY-DELTA incremental build (q159's storm drain / settled
  *      cascade level): the no-op gate path.
  *   B. SMALL-DELTA incremental build (one fresh record): the full
  *      map→spool→reduce→commit pipeline.
  *   C. dataset write commit (q146's per-request PUT path).
  * Run: `sbt "runMain graft.CommitProbe"`. Output: one line per job
  * (id, duration ms, call site), then per-shape totals.
  *
  * FINDINGS (r16, the measurement behind the input-versions fast
  * path — see PLANS.md "Per-commit fixed cost"): empty-delta builds
  * went 5 jobs / ~0.4-0.9 s → 0 jobs / ~4-16 ms; small-delta builds
  * keep their 11 jobs (gate query ~5 under AQE, spool write, commit
  * chain — all load-bearing); dataset writes keep 3. */
object CommitProbe {
  private object TagFn extends MapFn {
    def map(ctx: MapContext): Unit =
      ctx.data match {
        case PoObj(f) => f.get("tags") match {
          case Some(PoArr(ts)) => ts.foreach {
            case PoStr(t) => ctx.output(t, PoSet(PoStr(ctx.path.recordID)))
            case _ => ()
          }
          case _ => ()
        }
        case _ => ()
      }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = j.stageInfos.map(_.name).distinct.mkString(" | ")
        jobs.put(j.jobId, (j.time, site))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        done.put(j.jobId, j.time)
    })
    def flush(): Unit =
      org.apache.spark.GraftSparkShim.flushListenerBus(spark.sparkContext)

    def census[A](tag: String)(body: => A): A = {
      flush(); jobs.clear(); done.clear()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      flush()
      val rows = jobs.entrySet().iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
      while (rows.hasNext) {
        val e = rows.next()
        val (t, site) = e.getValue
        val dur = Option(done.get(e.getKey)).map(_ - t).getOrElse(-1L)
        buf += ((e.getKey, dur, site))
      }
      buf.sortBy(_._1).foreach { case (id, dur, site) =>
        println(f"JOB  $tag%-14s #$id%-4d ${dur}%5d ms  $site")
      }
      println(f"SHAPE $tag%-13s jobs=${buf.size}%-3d wall=${wall}%.3f s")
      r
    }

    // SPARK_GRAFT_PLANLOG=1: dump the EXECUTED plan (AQE-final) of every
    // write/commit query between PLAN-BEGIN/PLAN-END markers — the
    // evidence surface for plans/r18 (VERDICT r17 Next #3: the
    // interesting plan of a store commit is the snapshot-write job,
    // which `df.explain` on the fixture's RESULT frame never shows).
    val planlog = sys.env.get("SPARK_GRAFT_PLANLOG").contains("1")
    if (planlog)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            println(s"PLAN-BEGIN $funcName")
            println(qe.executedPlan.toString)
            println("PLAN-END")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })

    val root = Fs.pidScratch("graft-commitprobe")
    val store = new Store(spark, root)
    val d = store.dataset("a", "docs").create()
    (1 to 50).foreach(i => d.write(s"r$i",
      PoObj("tags" -> PoArr(Vector(PoStr(s"t${i % 7}"), PoStr(s"t${i % 3}"))))))
    val lens = new Lens(store, "a", "tags",
      Seq(DataPath("datasets", "a", "docs")), TagFn).create()
    lens.build() // cold full build, not the shape under test

    census("warm_noop")(lens.build())
    census("empty_delta")(lens.build())
    d.write("r1b", PoObj("tags" -> PoArr(Vector(PoStr("t1")))))
    census("small_delta")(lens.build())
    census("dataset_write")(d.write("r2b",
      PoObj("tags" -> PoArr(Vector(PoStr("t2"))))))

    // D. single-record merge into a LARGER unbucketed store — the
    // VERDICT r17 "what's wrong" #3 shape: the snapshot side must reach
    // the write through a filter, not a full-outer shuffle.
    import spark.implicits._
    val big = store.dataset("a", "bigdocs").create()
    big.writeEntriesDF(
      spark.range(0, 5000).as[Long]
        .map(i => (i.toString, Cbor.encode(PoObj("text" -> PoStr(s"v$i"))), false))
        .toDF("id", "value", "tombstone"),
      graft.store.WriteMode.Overwrite)
    census("merge_1_of_5000")(big.write("77",
      PoObj("tags" -> PoArr(Vector(PoStr("t"))))))
    census("delete_1_of_5000")(big.delete("78"))

    spark.stop()
  }
}
