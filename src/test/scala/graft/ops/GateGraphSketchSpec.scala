package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.expressions.KMinDistinct

/** Round-10 tail landings (q91-q94): the per-group KMV aggregate,
  * robots-exclusion gate, l-diversity gate, and PageRank — the four
  * components VERDICT r10 flagged as spec-less. */
class GateGraphSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- KMinDistinct: the aggregate object itself ----

  private def agg(k: Int) = KMinDistinct(BoundReference(0, LongType, nullable = true), k)

  private def drain(b: java.util.TreeSet[java.lang.Long]): Seq[Long] = {
    val it = b.iterator(); val out = Seq.newBuilder[Long]
    while (it.hasNext) out += it.next().longValue()
    out.result()
  }

  test("KMinDistinct update keeps the k smallest distinct values, skips nulls") {
    val a = agg(4)
    val b = a.createAggregationBuffer()
    // duplicates, out of order, one null
    Seq[Any](9L, 3L, 9L, 7L, null, 1L, 5L, 3L, 8L)
      .foreach(v => a.update(b, InternalRow(v)))
    assert(drain(b) == Seq(1L, 3L, 5L, 7L))
    assert(b.size <= 4)
    // a new minimum displaces the current 4th-smallest
    a.update(b, InternalRow(2L))
    assert(drain(b) == Seq(1L, 2L, 3L, 5L))
    // equal to the current k-th min: already present, no change
    a.update(b, InternalRow(5L))
    assert(drain(b) == Seq(1L, 2L, 3L, 5L))
  }

  test("KMinDistinct merge equals the k smallest distinct of the union") {
    val a = agg(3)
    val x = a.createAggregationBuffer()
    val y = a.createAggregationBuffer()
    Seq(10L, 20L, 30L).foreach(v => a.update(x, InternalRow(v)))
    Seq(5L, 20L, 40L).foreach(v => a.update(y, InternalRow(v)))
    // union distinct = {5,10,20,30,40}; 3 smallest = 5,10,20
    assert(drain(a.merge(x, y)) == Seq(5L, 10L, 20L))
    // merge into an empty buffer (the ascending early-bail must not
    // skip values when the target is under-filled)
    val z = a.createAggregationBuffer()
    assert(drain(a.merge(z, y)) == Seq(5L, 20L, 40L))
  }

  test("KMinDistinct serde round-trips and empty buffers survive") {
    val a = agg(5)
    val b = a.createAggregationBuffer()
    Seq(42L, -7L, 0L).foreach(v => a.update(b, InternalRow(v)))
    assert(drain(a.deserialize(a.serialize(b))) == Seq(-7L, 0L, 42L))
    val e = a.createAggregationBuffer()
    assert(drain(a.deserialize(a.serialize(e))).isEmpty)
  }

  test("KMinDistinct k-bound invariant holds through bulk update + merge") {
    val a = agg(8)
    val bufs = (0 until 4).map { p =>
      val b = a.createAggregationBuffer()
      (0 until 1000).foreach(i => a.update(b, InternalRow((i * 37 + p).toLong % 501L)))
      assert(b.size <= 8, s"partition buffer exceeded k: ${b.size}")
      b
    }
    val merged = bufs.reduce(a.merge)
    assert(merged.size == 8)
    assert(drain(merged) == drain(merged).sorted)
  }

  // ---- kmvDistinctBy: end-to-end + plan shape ----

  test("kmvDistinctBy is exact below k and matches countDistinct per group") {
    val df = (1 to 200).map(i => (s"g${i % 3}", s"v${i % (20 + (i % 3) * 5)}"))
      .toDF("g", "x")
    val got = Sketch.kmvDistinctBy(df, Seq("g"), col("x"), k = 64)
      .select(col("g"), col("est_distinct")).as[(String, Long)].collect().toMap
    val want = df.groupBy("g").agg(countDistinct(col("x")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("kmvDistinctBy exchange carries partial k-bounded buffers, not raw rows") {
    val df = (1 to 100).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "x")
    val plan = Sketch.kmvDistinctBy(df, Seq("g"), col("x"), k = 16)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate compiles to ObjectHashAggregate with a
    // partial mode BELOW the exchange — the k-bound applies map-side
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_k_min_distinct"), plan)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_k_min_distinct")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial aggregate must sit below the exchange:\n$plan")
  }

  test("kmvDistinct (global) has no corpus-cardinality hash exchange") {
    val df = (1 to 5000).map(i => s"v${i % 999}").toDF("x")
    val q = Sketch.kmvDistinct(df, col("x"), k = 64)
    // the old spelling paid `Exchange hashpartitioning` for distinct();
    // the aggregate form moves only partial buffers to one reducer
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"global KMV must not shuffle corpus-cardinality rows:\n$plan")
    assert(plan.contains("partial_k_min_distinct"), plan)
    assert(q.head().getAs[Long]("est_distinct") > 0L)
  }

  test("kmvDistinctBy maintains incrementally under Structured Streaming") {
    // the per-group sketch is a TypedImperativeAggregate, so its
    // k-bounded buffer must round-trip the streaming state store:
    // feed two batches, assert the estimate converges on the exact
    // distinct count like the batch path (k above cardinality)
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = Sketch.kmvDistinctBy(in.toDF().toDF("g", "x"), Seq("g"), col("x"), k = 64)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      in.addData((1 to 30).map(i => ("a", s"v${i % 10}")): _*)
      q.processAllAvailable()
      val r1 = spark.table("kmv_stream")
        .select(col("g"), col("est_distinct")).as[(String, Long)].collect().toMap
      assert(r1 == Map("a" -> 10L))
      // batch 2: new values for group a, a brand-new group b — state
      // (the serialized k-min buffer) must merge, not reset
      in.addData((1 to 20).map(i => ("a", s"w$i")) ++ Seq(("b", "z1"), ("b", "z2")): _*)
      q.processAllAvailable()
      val r2 = spark.table("kmv_stream")
        .select(col("g"), col("est_distinct")).as[(String, Long)].collect().toMap
      assert(r2 == Map("a" -> 30L, "b" -> 2L))
    } finally q.stop()
  }

  // ---- robotsGate ----

  private val robotsRules = Seq(
    ("a.com", "/p", false), ("a.com", "/p1", true), ("a.com", "/p12", false),
    ("t.com", "/x", true), ("t.com", "/x", false), // equal-length tie
    ("all.com", "/", false))
    .toDF("domain", "prefix", "allow")

  private def gate(urls: Seq[(Long, String)]) =
    UrlOps.robotsGate(urls.toDF("doc_id", "url"), robotsRules, col("url"))
      .select(col("id"), col("allowed"), col("matched_prefix"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2))))).toMap

  test("robotsGate picks the longest matching prefix") {
    val out = gate(Seq(
      (1L, "https://www.a.com/p0"),    // only /p matches -> disallow
      (2L, "https://www.a.com/p1"),    // /p1 beats /p -> allow
      (3L, "https://www.a.com/p123"))) // /p12 beats /p1 -> disallow
    assert(out(1L) == ((false, Some("/p"))))
    assert(out(2L) == ((true, Some("/p1"))))
    assert(out(3L) == ((false, Some("/p12"))))
  }

  test("robotsGate equal-length tie: allow beats disallow; blanket '/' disallows") {
    val out = gate(Seq(
      (1L, "https://t.com/x9"),
      (2L, "https://sub.all.com/anything")))
    assert(out(1L) == ((true, Some("/x"))))
    assert(out(2L) == ((false, Some("/"))))
  }

  test("robotsGate rule-less domains surface allowed with NULL matched_*") {
    val out = gate(Seq((1L, "https://nobody.org/whatever")))
    assert(out(1L) == ((true, None)))
  }

  test("robotsGate RFC 9309 wildcards: * spans, trailing $ anchors, longest pattern wins") {
    val rules = Seq(
      ("w.com", "/a*z", false),      // any path /a...z...
      ("w.com", "/a", true),
      ("e.com", "/p*9$", false),     // ends in 9
      ("e.com", "/p", true),
      ("d.com", "/f.h*", false),     // '.' must be LITERAL, not regex any-char
      ("m.com", "/x$y", true),       // mid-pattern $ is literal
      ("m.com", "/x", false))
      .toDF("domain", "prefix", "allow")
    def run(urls: Seq[(Long, String)]) =
      UrlOps.robotsGate(urls.toDF("doc_id", "url"), rules, col("url"))
        .select(col("id"), col("allowed"), col("matched_prefix"))
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(1), Option(r.getString(2))))).toMap
    val out = run(Seq(
      (1L, "https://w.com/abcz-tail"),  // /a*z (len 4) beats /a (len 2)
      (2L, "https://w.com/abc"),        // only /a matches
      (3L, "https://e.com/p19"),        // anchored disallow fires
      (4L, "https://e.com/p190"),       // does NOT end in 9 -> /p allow
      (5L, "https://d.com/fgh"),        // literal '.' must not match 'g'
      (6L, "https://d.com/f.h"),        // literal '.' matches itself
      (7L, "https://m.com/x$y1"),       // literal mid-$ matches, len 4 wins
      (8L, "https://m.com/xzz")))       // mid-$ rule doesn't match -> /x
    assert(out(1L) == ((false, Some("/a*z"))))
    assert(out(2L) == ((true, Some("/a"))))
    assert(out(3L) == ((false, Some("/p*9$"))))
    assert(out(4L) == ((true, Some("/p"))))
    assert(out(5L) == ((true, None)))
    assert(out(6L) == ((false, Some("/f.h*"))))
    assert(out(7L) == ((true, Some("/x$y"))))
    assert(out(8L) == ((false, Some("/x"))))
  }

  test("robotsGate joins broadcast — zero shuffle of the URL side") {
    val plan = UrlOps.robotsGate(
        Seq((1L, "https://a.com/p")).toDF("doc_id", "url"), robotsRules, col("url"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ---- frontierSchedule byHost ----

  test("frontierSchedule byHost queues subdomains independently") {
    // one registered domain (blog.com), three hosts: domain-keyed
    // politeness serializes them into one queue; host-keyed gives each
    // its own slot sequence
    val urls = Seq(
      (1L, "https://a.blog.com/1", 9L), (2L, "https://a.blog.com/2", 8L),
      (3L, "https://b.blog.com/1", 7L), (4L, "https://c.blog.com/1", 6L))
      .toDF("doc_id", "url", "priority")
    val byDomain = UrlOps.frontierSchedule(urls, col("url"), col("priority"))
      .select(col("id"), col("slot")).as[(Long, Long)].collect().toMap
    assert(byDomain == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    val byHost = UrlOps.frontierSchedule(urls, col("url"), col("priority"),
        byHost = true)
      .select(col("id"), col("domain"), col("slot"))
      .as[(Long, String, Long)].collect()
    assert(byHost.map(r => r._1 -> r._3).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    assert(byHost.map(_._2).toSet ==
      Set("a.blog.com", "b.blog.com", "c.blog.com"))
  }

  // ---- lDiversityGate ----

  test("lDiversityGate drops homogeneous groups k-anonymity would keep") {
    // group A: 10 rows, ONE sensitive value (passes k=3, fails l=3)
    // group B: 4 rows, 3 distinct sensitive values (passes both)
    val df = ((1 to 10).map(i => (i.toLong, "A", "s1")) ++
      Seq((11L, "B", "s1"), (12L, "B", "s2"), (13L, "B", "s3"), (14L, "B", "s1")))
      .toDF("id", "qi", "sensitive")
    val kept = Pii.lDiversityGate(df, Seq("qi"), "sensitive", l = 3)
    assert(Pii.kAnonymityGate(df, Seq("qi"), k = 3).filter(col("qi") === "A").count() == 10)
    assert(kept.filter(col("qi") === "A").count() == 0)
    val b = kept.filter(col("qi") === "B")
      .select(col("id"), col("distinct_sensitive")).as[(Long, Long)].collect()
    assert(b.map(_._1).sorted.toSeq == Seq(11L, 12L, 13L, 14L))
    assert(b.forall(_._2 == 3L))
  }

  test("lDiversityGate uses one QI exchange for both windows") {
    val df = Seq((1L, "A", "s1"), (2L, "A", "s2")).toDF("id", "qi", "sensitive")
    val plan = Pii.lDiversityGate(df, Seq("qi"), "sensitive", l = 2)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  // ---- pageRank ----

  test("pageRank on a 2-node cycle is the closed-form fixed point") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, iterations = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    // symmetric cycle: 1/N is the exact fixed point at every iteration
    assert(pr(0L) == 0.5 && pr(1L) == 0.5)
  }

  test("pageRank dangling node: teleport-only rank, mass leaks by design") {
    // A -> B, C isolated. After 1 iteration, in the implementation's
    // IEEE op order: teleport = (1.0-0.85)/3 (note 1.0-0.85 is NOT an
    // exact 0.15); B = teleport + 0.85*(1/3); A = C = teleport
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, iterations = 1, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val teleport = (1.0 - 0.85) / 3.0
    assert(pr(1L) == teleport + 0.85 * (1.0 / 3.0))
    assert(pr(0L) == teleport && pr(2L) == teleport)
    assert(pr.values.sum < 1.0) // dangling mass not redistributed
  }

  test("pageRank duplicate edges count once; exactFold agrees with sum within ulps") {
    val n = 20L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n).flatMap(i =>
        Seq((i, (2 * i + 1) % n), (i, (3 * i + 7) % n), (i, (2 * i + 1) % n)))
      .toDF("src", "dst")
    val fast = Graph.pageRank(nodes, edges, iterations = 4)
      .as[(Long, Double)].collect().toMap
    val exact = Graph.pageRank(nodes, edges, iterations = 4, exactFold = true)
      .as[(Long, Double)].collect().toMap
    assert(fast.keySet == exact.keySet)
    fast.foreach { case (id, v) =>
      assert(math.abs(v - exact(id)) <= 1e-12, s"node $id: $v vs ${exact(id)}")
    }
    // ranks are a probability-ish vector: positive, sum near 1 (self-loops
    // and full out-degrees on this fixture -> no dangling leak)
    assert(fast.values.forall(_ > 0))
    assert(math.abs(fast.values.sum - 1.0) < 1e-9)
  }

  // ---- hits ----

  test("hits on a star: center is the sole authority, leaves the hubs") {
    // leaves 1,2,3 all point at 0. auth(0)=1 (only in-link target),
    // hub(leaf)=1 (all tied at max), and the converse scores are 0.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r = Graph.hits(nodes, edges, iterations = 3)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> ((h, a)) }.toMap
    assert(r(0L) == ((0.0, 1.0)))
    Seq(1L, 2L, 3L).foreach(l => assert(r(l) == ((1.0, 0.0))))
  }

  test("hits hand-computed: chain with a shared target") {
    // 0->2, 1->2, 1->3. Expected scores replayed with the exact same
    // IEEE op sequence as the implementation (fold seeded at 0.0 in
    // neighbor order, then s / max(s), missing nodes 0.0).
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 2L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.hits(nodes, edges, iterations = 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> ((h, a)) }.toMap
    // iter 1: a(2)=(0+1)+1=2, a(3)=0+1=1 -> auth1 = s/2
    val auth1_2 = ((0.0 + 1.0) + 1.0) / 2.0; val auth1_3 = (0.0 + 1.0) / 2.0
    // h(0)=0+auth1(2), h(1)=(0+auth1(2))+auth1(3); max is h(1)
    val h1_0 = 0.0 + auth1_2; val h1_1 = (0.0 + auth1_2) + auth1_3
    val hub1_0 = h1_0 / h1_1
    // iter 2: a(2)=(0+hub1(0))+hub1(1), a(3)=0+hub1(1); max is a(2)
    val a2_2 = (0.0 + hub1_0) + (h1_1 / h1_1)
    val auth2_3 = (0.0 + (h1_1 / h1_1)) / a2_2
    // h(0)=0+auth2(2)=1, h(1)=(0+1)+auth2(3); max is h(1)
    val h2_1 = (0.0 + a2_2 / a2_2) + auth2_3
    assert(r(2L)._2 == a2_2 / a2_2 && r(2L)._2 == 1.0)
    assert(r(3L)._2 == auth2_3)
    assert(r(1L)._1 == h2_1 / h2_1 && r(1L)._1 == 1.0)
    assert(r(0L)._1 == (0.0 + a2_2 / a2_2) / h2_1)
    assert(r(2L)._1 == 0.0 && r(3L)._1 == 0.0) // no out-links
    assert(r(0L)._2 == 0.0 && r(1L)._2 == 0.0) // no in-links
  }

  test("hits duplicate edges count once; exactFold agrees with sum within ulps") {
    val n = 20L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n).flatMap(i =>
        Seq((i, (2 * i + 1) % n), (i, (3 * i + 7) % n), (i, (2 * i + 1) % n)))
      .toDF("src", "dst")
    val fast = Graph.hits(nodes, edges, iterations = 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> ((h, a)) }.toMap
    val exact = Graph.hits(nodes, edges, iterations = 2, exactFold = true)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> ((h, a)) }.toMap
    assert(fast.keySet == exact.keySet)
    fast.foreach { case (id, (h, a)) =>
      assert(math.abs(h - exact(id)._1) <= 1e-12, s"hub $id")
      assert(math.abs(a - exact(id)._2) <= 1e-12, s"auth $id")
    }
    // max-normalized: every score in [0,1], at least one exact 1.0 each
    assert(fast.values.forall { case (h, a) => h >= 0 && h <= 1 && a >= 0 && a <= 1 })
    assert(fast.values.exists(_._1 == 1.0) && fast.values.exists(_._2 == 1.0))
  }

  // ---- personalizedPageRank ----

  test("trustrank: teleport mass lands only on seeds; non-seeds hold propagated mass") {
    // seed 0 -> 1 -> 2, plus isolated 3. After 1 iter: seed teleport +
    // nothing inbound for 0; node 1 gets 0.85 * (1.0/1) from seed 0;
    // 2 and 3 get exactly 0 (their in-neighbors had rank 0).
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val r = Graph.personalizedPageRank(nodes, edges, seeds, iterations = 1)
      .as[(Long, Double)].collect().toMap
    val teleport = (1.0 - 0.85) / 1.0
    assert(r(0L) == teleport)
    assert(r(1L) == 0.85 * (1.0 / 1.0))
    assert(r(2L) == 0.0 && r(3L) == 0.0)
    // iteration 2: rank reaches node 2 through 1
    val r2 = Graph.personalizedPageRank(nodes, edges, seeds, iterations = 2)
      .as[(Long, Double)].collect().toMap
    assert(r2(2L) == 0.85 * (0.85 * (1.0 / 1.0)) && r2(3L) == 0.0)
  }

  test("trustrank with ALL nodes seeded equals uniform pageRank") {
    val n = 12L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n).flatMap(i =>
      Seq((i, (2 * i + 1) % n), (i, (3 * i + 7) % n))).toDF("src", "dst")
    val ppr = Graph.personalizedPageRank(nodes, edges, nodes, iterations = 3)
      .as[(Long, Double)].collect().toMap
    val pr = Graph.pageRank(nodes, edges, iterations = 3)
      .as[(Long, Double)].collect().toMap
    // identical op sequence when |S| = N -> bit-equal, not just close
    assert(ppr == pr)
  }

  test("trustrank exactFold agrees with sum within ulps; seeds dominate near seeds") {
    val n = 20L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n).flatMap(i =>
      Seq((i, (2 * i + 1) % n), (i, (3 * i + 7) % n))).toDF("src", "dst")
    val seeds = Seq(5L).toDF("id")
    val fast = Graph.personalizedPageRank(nodes, edges, seeds, iterations = 4)
      .as[(Long, Double)].collect().toMap
    val exact = Graph.personalizedPageRank(nodes, edges, seeds,
        iterations = 4, exactFold = true)
      .as[(Long, Double)].collect().toMap
    fast.foreach { case (id, v) =>
      assert(math.abs(v - exact(id)) <= 1e-12, s"node $id") }
    // seed 5's direct successors (11, 2) carry mass; total mass <= 1
    assert(fast(11L) > 0 && fast(2L) > 0)
    assert(fast.values.sum <= 1.0 + 1e-9)
  }

  // ---- labelPropagation ----

  test("labelPropagation collapses a star onto the min label in one round") {
    // center 0, leaves 1..4: every leaf's only neighbor is 0; 0's
    // neighbors are all distinct labels -> tie -> min label 1.
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("src", "dst")
    val r1 = Graph.labelPropagation(nodes, edges, iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // round 2: leaves see center's label 1; center sees all-0 -> flips
    val r2 = Graph.labelPropagation(nodes, edges, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("labelPropagation: two dense blocks keep separate communities") {
    // blocks {0..3} and {10..13} as cliques, one weak bridge 3-10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val nodes = ((0L to 3L) ++ (10L to 13L)).toDF("id")
    val edges = (clique(0L to 3L) ++ clique(10L to 13L) :+ ((3L, 10L)))
      .toDF("src", "dst")
    val r = Graph.labelPropagation(nodes, edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    val left = (0L to 3L).map(r)
    val right = (10L to 13L).map(r)
    assert(left.toSet.size == 1 && right.toSet.size == 1)
    assert(left.head != right.head)
  }

  test("labelPropagation: isolated nodes and self-loops keep their own label") {
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 0L), (1L, 2L)).toDF("src", "dst") // self-loop dropped
    val odd = Graph.labelPropagation(nodes, edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    val even = Graph.labelPropagation(nodes, edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(odd(0L) == 0L && even(0L) == 0L) // self-loop ignored -> isolated
    // synchronous LPA on a 2-cycle oscillates: swapped at odd rounds,
    // home again at even rounds — the documented determinism contract
    assert(odd(1L) == 2L && odd(2L) == 1L)
    assert(even(1L) == 1L && even(2L) == 2L)
  }
}
