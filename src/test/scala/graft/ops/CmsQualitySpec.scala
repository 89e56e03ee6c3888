package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Count-min sketch frequency estimates (q130) and the hashed-feature
  * linear quality score (q131): CMS upper-bound guarantee, exactness
  * without collisions, partition invariance; scorer vs a from-scratch
  * reference implementation. */
class CmsQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def sha60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"${b & 0xff}%02x")
      .mkString.take(15), 16)
  }

  private def cms(keys: Seq[String], probes: Seq[String], depth: Int,
                  width: Int, parts: Int = 4): Map[String, Long] = {
    import spark.implicits._
    Sketch.cmsFrequency(
        keys.toDF("k").repartition(parts), col("k"),
        probes.toDF("p"), "p", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("CMS estimate is an upper bound and exact absent collisions") {
    val keys = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++
      (1 to 50).map(i => s"unique$i")
    // width 1<<20 over ~52 distinct keys: collision probability ~0 per
    // row, and ALL 4 rows colliding simultaneously is impossible here
    val est = cms(keys, Seq("alpha", "beta", "unique1", "absent"), 4, 1 << 20)
    assert(est == Map("alpha" -> 40L, "beta" -> 7L, "unique1" -> 1L,
      "absent" -> 0L))
    // tiny width forces collisions: still an upper bound, never under
    val tight = cms(keys, Seq("alpha", "beta", "unique1", "absent"), 4, 16)
    assert(tight("alpha") >= 40L && tight("beta") >= 7L &&
      tight("unique1") >= 1L && tight("absent") >= 0L)
  }

  test("CMS grid merge is partition-invariant") {
    val keys = (1 to 500).map(i => s"k${i % 37}")
    val probes = (0 until 37).map(i => s"k$i")
    assert(cms(keys, probes, 4, 64, parts = 1) ==
      cms(keys, probes, 4, 64, parts = 13))
  }

  test("CMS exchange is grid-bounded: partial aggregation on the cell key") {
    import spark.implicits._
    val q = Sketch.cmsFrequency((1 to 2000).map(i => s"t$i").toDF("k"),
      col("k"), Seq("t1").toDF("p"), "p", 4, 32)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("BroadcastHashJoin"), s"grid must broadcast:\n$plan")
  }

  // ---- hashedQualityScore ----

  private def refScore(text: String, buckets: Int): (Long, Long, Double) = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val num = feats.map(f => (sha60(f) % buckets) % 2001 - 1000).sum
    val n = feats.size.toLong
    (n, num, if (n == 0) 0.0 else num.toDouble / (n * 1000L).toDouble)
  }

  test("hashedQualityScore matches the from-scratch reference exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "one"),
      (3L, "!!! ???"), // zero features
      (4L, "repeated repeated repeated words words"))
    val got = TextOps.hashedQualityScore(docs.toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val want = docs.map { case (id, t) =>
      val (n, num, s) = refScore(t, 4096); (id, n, num, s)
    }
    assert(got == want)
  }

  test("NULL text scores as an empty doc, per the output contract") {
    import spark.implicits._
    val got = TextOps.hashedQualityScore(
        Seq((1L, null: String), (2L, "real words here")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getDouble(3)) ==
      ((0L, 0L, 0.0)))
    assert(got(1).getLong(1) > 0L)
  }

  test("production xx64 bucket hash: same features, same range, cheaper path") {
    import spark.implicits._
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "!!! ???")).toDF("doc_id", "text")
    val p = TextOps.hashedQualityScore(docs, portableHash = true)
      .orderBy("doc_id").collect()
    val x = TextOps.hashedQualityScore(docs, portableHash = false)
      .orderBy("doc_id").collect()
    // feature COUNTS are hash-independent; scores differ but stay in
    // the mean-milli-weight envelope [-1, 1]
    assert(p.map(_.getLong(1)).toSeq == x.map(_.getLong(1)).toSeq)
    assert(x.forall(r => math.abs(r.getDouble(3)) <= 1.0))
  }

  test("hashedQualityScore plans zero exchanges (pure scan-stage map)") {
    import spark.implicits._
    val q = TextOps.hashedQualityScore(
      (1L to 50L).map(i => (i, s"doc number $i with some text")).toDF("doc_id", "text"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scorer must not shuffle:\n$plan")
  }
}
