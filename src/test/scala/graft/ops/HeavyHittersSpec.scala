package graft.ops

import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.expressions.MisraGries

/** The Misra–Gries candidate aggregate and the exact two-pass heavy
  * hitters built on it ([[Sketch.heavyHitters]], q99). The load-bearing
  * property is the superset guarantee: after ANY partitioning and merge
  * order, every key with frequency > n/(k+1) still holds a counter —
  * that is what makes pass 2's exact threshold an exact answer. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def agg(k: Int) = MisraGries(BoundReference(0, LongType, nullable = true), k)

  private def keys(b: java.util.HashMap[java.lang.Long, java.lang.Long]): Set[Long] = {
    val it = b.keySet().iterator(); val out = Set.newBuilder[Long]
    while (it.hasNext) out += it.next().longValue
    out.result()
  }

  test("MisraGries update: hit increments, room inserts, full decrements all") {
    val a = agg(2)
    val b = a.createAggregationBuffer()
    Seq[Any](1L, 1L, 2L, null, 3L).foreach(v => a.update(b, InternalRow(v)))
    // 3 arrives full: {1:2, 2:1} -> decrement -> {1:1}; 3 absorbed
    assert(b.get(1L) == 1L && b.size == 1)
    a.update(b, InternalRow(5L))
    assert(keys(b) == Set(1L, 5L))
  }

  test("MisraGries merge sums pointwise then offsets by the (k+1)-th largest") {
    val a = agg(2)
    val x = a.createAggregationBuffer()
    val y = a.createAggregationBuffer()
    Seq(10L, 10L, 10L, 20L).foreach(v => a.update(x, InternalRow(v)))   // {10:3, 20:1}
    Seq(20L, 30L, 30L).foreach(v => a.update(y, InternalRow(v)))        // {20:1, 30:2}
    val m = a.merge(x, y) // pointwise {10:3, 20:2, 30:2}; offset = 2 (3rd largest)
    assert(keys(m) == Set(10L) && m.get(10L) == 1L)
  }

  test("MisraGries serde round-trips, empty buffers survive") {
    val a = agg(4)
    val b = a.createAggregationBuffer()
    Seq(7L, 7L, -1L).foreach(v => a.update(b, InternalRow(v)))
    val r = a.deserialize(a.serialize(b))
    assert(keys(r) == Set(7L, -1L) && r.get(7L) == 2L)
    assert(keys(a.deserialize(a.serialize(a.createAggregationBuffer()))).isEmpty)
  }

  test("MisraGries superset guarantee holds under random partitioning + merge order") {
    // a long quadratically-skewed tail plus two dominant items; any
    // item with freq > n/(k+1) must survive every partition/merge
    // arrangement
    val items = (1 to 60).flatMap(i => Seq.fill((i * i) / 30 + 1)(i.toLong)) ++
      Seq.fill(800)(100L) ++ Seq.fill(400)(101L)
    val n = items.size
    val k = 9
    val freq = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = freq.filter(_._2 * (k + 1) > n).keySet
    assert(mustSurvive.nonEmpty, "fixture must have guaranteed-heavy items")
    val a = agg(k)
    for (seed <- 1 to 50) {
      val rnd = new Random(seed)
      val parts = rnd.shuffle(items).grouped(n / (2 + rnd.nextInt(6)) + 1).toSeq
      val bufs = parts.map { p =>
        val b = a.createAggregationBuffer()
        p.foreach(v => a.update(b, InternalRow(v)))
        assert(b.size <= k, s"buffer exceeded k: ${b.size}")
        b
      }
      val merged = rnd.shuffle(bufs).reduce { (x, y) =>
        val m = a.merge(x, y); assert(m.size <= k); m
      }
      assert(mustSurvive.subsetOf(keys(merged)),
        s"seed $seed lost ${mustSurvive.diff(keys(merged))}")
    }
  }

  test("heavyHitters equals the brute-force GROUP BY / HAVING answer") {
    val rows = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(150)("c") ++
      (1 to 2000).map(i => s"u$i") ++ Seq(null.asInstanceOf[String])
    val df = new Random(7).shuffle(rows).toDF("x")
    // n = 2950 non-null; threshold n/10 = 295: a (500) and b (300)
    // qualify, c (150) and every unique filler do not
    val got = Sketch.heavyHitters(df, col("x"), denom = 10)
      .as[(String, Long)].collect().toMap
    val want = df.filter(col("x").isNotNull).groupBy("x").count()
      .filter(col("count") * 10 > 2950L).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 500L, "b" -> 300L))
    assert(got == want)
  }

  test("heavyHittersBy equals the per-group brute-force answer") {
    // group g1: hot 40/100; g2: warm 15/100 (fails denom=5's 20%);
    // g3: all unique (no heavy hitters at all)
    val rows =
      Seq.fill(40)(("g1", "hot")) ++ (1 to 60).map(i => ("g1", s"a$i")) ++
      Seq.fill(15)(("g2", "warm")) ++ (1 to 85).map(i => ("g2", s"b$i")) ++
      (1 to 50).map(i => ("g3", s"c$i"))
    val df = new Random(11).shuffle(rows).toDF("g", "x")
    val got = Sketch.heavyHittersBy(df, Seq("g"), col("x"), denom = 5)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("g1", "hot", 40L, 100L)))
    val want = df.groupBy("g", "x").count()
      .join(df.groupBy("g").agg(count(lit(1)).as("n")), "g")
      .filter(col("count") * 5 > col("n"))
      .select(col("g"), col("x"), col("count"), col("n"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("heavyHittersBy keeps a NULL group's heavy hitters (null-safe probe join)") {
    // GROUP BY treats NULL as a real group; the pass-2 probe join must
    // match it too (r11 advice: plain === dropped it silently)
    val rows = Seq.fill(40)((null: String, "hot")) ++
      (1 to 60).map(i => (null: String, s"a$i")) ++
      Seq.fill(30)(("g1", "warm")) ++ (1 to 70).map(i => ("g1", s"b$i"))
    val df = new Random(13).shuffle(rows).toDF("g", "x")
    val got = Sketch.heavyHittersBy(df, Seq("g"), col("x"), denom = 5)
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((None, "hot", 40L, 100L), (Some("g1"), "warm", 30L, 100L)))
  }

  test("heavyHittersBy probes candidates via broadcast — corpus side never shuffles pre-count") {
    val df = spark.range(0, 3000)
      .select(concat(lit("g"), col("id") % 2).as("g"),
        when(col("id") % 3 === 0, lit("hot"))
          .otherwise(concat(lit("u"), col("id"))).as("x"))
    val q = Sketch.heavyHittersBy(df, Seq("g"), col("x"), denom = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"candidate probe must broadcast:\n$plan")
    assert(plan.contains("partial_count"), plan)
    assert(q.as[(String, String, Long, Long)].collect().toSet ==
      Set(("g0", "hot", 500L, 1500L), ("g1", "hot", 500L, 1500L)))
  }

  test("frequentCandidatesBy maintains MG state under Structured Streaming") {
    // the k-bounded counter map must round-trip the streaming state
    // store: a key made heavy in batch 1 must still be a candidate
    // after a batch-2 flood of uniques (a reset buffer would lose it)
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = Sketch.frequentCandidatesBy(in.toDF().toDF("g", "x"), Seq("g"),
        col("x"), k = 4)
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      val hotHash = spark.range(1)
        .select(Sketch.hash60(lit("hot")).as("h")).as[Long].head()
      in.addData(Seq.fill(30)(("a", "hot")) ++ (1 to 10).map(i => ("a", s"u$i")): _*)
      q.processAllAvailable()
      val r1 = spark.table("mg_stream").select(col("candidates"))
        .as[Seq[Long]].collect().head
      assert(r1.contains(hotHash) && r1.size <= 4)
      // 30 more uniques: hot's total 30 of 70 stays > 70/(k+1)=14, so
      // the merged (not reset) sketch must still hold it
      in.addData((11 to 40).map(i => ("a", s"u$i")): _*)
      q.processAllAvailable()
      val r2 = spark.table("mg_stream").select(col("candidates"))
        .as[Seq[Long]].collect().head
      assert(r2.contains(hotHash) && r2.size <= 4)
    } finally q.stop()
  }

  test("heavyHitters pass-2 plan: InSet candidate filter, partial count below the exchange") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold
    // the candidate filter into a LocalTableScan and hide the plan shape
    val df = spark.range(1, 3001)
      .select(when(col("id") % 3 === 0, lit("hot"))
        .otherwise(concat(lit("u"), col("id"))).as("x"))
    val q = Sketch.heavyHitters(df, col("x"), denom = 4)
    val plan = q.queryExecution.executedPlan.toString
    // candidate filter compiles to literal hash predicates (no join) —
    // IN/INSET for several candidates, folded to `=` when MG pruned to
    // one — and the exact count partial-aggregates map-side so the
    // exchange carries <= k rows per partition, not the kept corpus rows
    assert(plan.contains("Filter") && plan.contains("conv(substring(md5"), plan)
    assert(plan.contains("INSET") || plan.contains(" IN ") || plan.contains(" = "), plan)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_count")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial count must sit below the exchange:\n$plan")
    assert(q.as[(String, Long)].collect().toMap == Map("hot" -> 1000L))
  }
}
