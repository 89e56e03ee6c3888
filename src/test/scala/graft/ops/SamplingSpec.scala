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
}
