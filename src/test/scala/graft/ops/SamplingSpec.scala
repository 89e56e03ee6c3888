package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Deterministic-sampling contracts: stability across reruns AND
  * repartitions, split disjointness/coverage, stratified caps. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("deterministicSample: stable across reruns and repartitions") {
    import spark.implicits._
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.deterministicSample(df, "doc_id", 20)
        .select(col("doc_id")).as[Long].collect().toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13))
    assert(a == b, "membership must not depend on partitioning")
    assert(a.nonEmpty && a.size < 500)
    // roughly 20% (hash uniformity, wide tolerance)
    assert(a.size > 50 && a.size < 150, s"got ${a.size} of 500")
  }

  test("splits partition the corpus: [0,20) and [20,100) are disjoint and cover") {
    import spark.implicits._
    val in20 = Sampling.deterministicSample(docs, "doc_id", 20)
      .select(col("doc_id")).as[Long].collect().toSet
    val all = docs.select(col("doc_id")).as[Long].collect().toSet
    val rest = docs.filter(Sampling.hashBucket(col("doc_id")) >= 20)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(in20.intersect(rest).isEmpty)
    assert(in20.union(rest) == all)
  }

  test("corpusShuffle: dense per-shard positions, layout-independent order") {
    import spark.implicits._
    def addr(df: org.apache.spark.sql.DataFrame) =
      Sampling.corpusShuffle(df, "doc_id", shards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .as[(Long, Long, Long)].collect().toSet
    val a = addr(docs)
    assert(a.size == 500, "every row gets exactly one address")
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions within each shard are dense 1..n — a loader can stream
    // a shard by pos with no gaps
    a.groupBy(_._2).foreach { case (s, rows) =>
      val ps = rows.toSeq.map(_._3).sorted
      assert(ps.size == rows.size, s"shard $s has duplicated positions")
      assert(ps == (1L to ps.size), s"shard $s positions not dense: $ps")
    }
    // the address is a pure function of the id: any partitioning, same order
    assert(addr(docs.repartition(17)) == a)
    // not id order: the shuffle must actually permute within shards
    val byShard = a.groupBy(_._2).values
    assert(byShard.exists { rows =>
      val inPos = rows.toSeq.sortBy(_._3).map(_._1)
      inPos != inPos.sorted
    }, "pos order should not be id order")
  }

  test("stratifiedSample: per-stratum cap, deterministic membership") {
    import spark.implicits._
    val s1 = Sampling.stratifiedSample(docs, "lang", "doc_id", 10)
      .select(col("lang"), col("doc_id")).as[(String, Long)].collect()
    val byLang = s1.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang.values.forall(_ <= 10))
    assert(byLang.values.exists(_ == 10), "full strata must hit the cap")
    val s2 = Sampling.stratifiedSample(docs.repartition(7), "lang", "doc_id", 10)
      .select(col("lang"), col("doc_id")).as[(String, Long)].collect()
    assert(s1.toSet == s2.toSet)
  }

  test("splitAssign: disjoint-and-covering labels, closed under corpus growth") {
    import spark.implicits._
    val splits = Seq(("train", 90), ("val", 5), ("test", 5))
    val a = Sampling.splitAssign(docs, "doc_id", splits)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    assert(a.size == docs.count(), "every row gets exactly one label")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.values.toSet.size == 3, "all three splits must be populated")
    // closure: assignment of existing rows is untouched by new rows
    val grown = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 100000L))
    val b = Sampling.splitAssign(grown, "doc_id", splits)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    a.foreach { case (id, s) => assert(b(id) == s, s"row $id moved split") }
    // agreement with deterministicSample's bucket arithmetic: the
    // train set is exactly the < 90 pct sample
    val train90 = Sampling.deterministicSample(docs, "doc_id", 90)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(a.filter(_._2 == "train").keySet == train90)
    // zero shuffle in the assignment plan
    val plan = Sampling.splitAssign(docs, "doc_id", splits)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"splitAssign must not shuffle:\n$plan")
  }

  test("splitAssign: weights validated") {
    intercept[IllegalArgumentException](
      Sampling.splitAssign(docs, "doc_id", Seq(("a", 50), ("b", 49))))
    intercept[IllegalArgumentException](
      Sampling.splitAssign(docs, "doc_id", Seq(("a", 100), ("a", 0))))
  }
}
