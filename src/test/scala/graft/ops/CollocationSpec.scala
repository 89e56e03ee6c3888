package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Collocation mining: hand-computed lift, min-count pruning, ranking
  * determinism, and the TakeOrdered + broadcast plan. */
class CollocationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minCount: Long = 1, topK: Int = 50) =
    TextOps.collocations(docs.toDF("doc_id", "text"), minCount = minCount,
        topK = topK)
      .as[(String, Long, Long, Long, Double)].collect().toSeq

  test("lift matches the hand computation") {
    // corpus: "a b" x3, "a c" x1 -> bigrams: (a b):3, (a c):1, N=4
    // unigrams: a:4, b:3, c:1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
    val got = run(docs).map(r => r._1 -> r).toMap
    assert(got("a b") == ("a b", 3L, 4L, 3L, 3.0 * 4.0 / (4.0 * 3.0)))
    assert(got("a c") == ("a c", 1L, 4L, 1L, 1.0 * 4.0 / (4.0 * 1.0)))
  }

  test("high-lift pair outranks frequent-but-independent pair") {
    // "zx qy" always together (perfect collocation), "the the" frequent
    // but 'the' is everywhere
    val docs = Seq.tabulate(10)(i => (i.toLong, "the a the b zx qy the c")) :+
      (100L, "the the")
    val got = run(docs, minCount = 2)
    val maxLift = got.head._5
    // "zx qy" (and its equally-bound neighbor "b zx") carry the top
    // lift; every 'the'-anchored pair must rank strictly below
    assert(got.takeWhile(_._5 == maxLift).map(_._1).contains("zx qy"),
      s"got ${got.take(3)}")
    assert(got.filter(_._1.contains("the")).forall(_._5 < maxLift),
      s"got ${got.take(5)}")
  }

  test("minCount prunes the singleton tail") {
    val docs = Seq((1L, "rare pair common word common word"))
    assert(run(docs, minCount = 2).map(_._1) == Seq("common word"))
    assert(run(docs, minCount = 1).size == 4)
  }

  test("topK keeps the k best by (lift desc, bigram asc) — deterministic ties") {
    // four bigrams with identical statistics -> identical lift; the
    // lexicographically first two must win at topK=2
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "e f"), (4L, "g h"))
    val got = run(docs, topK = 2).map(_._1)
    assert(got == Seq("a b", "c d"))
  }

  test("plan: TakeOrderedAndProject top-k; unigram and total joins broadcast") {
    val docs = (1L to 60L).map(i => (i, s"alpha beta gamma d$i"))
    val q = TextOps.collocations(docs.toDF("doc_id", "text"), minCount = 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      plan)
  }
}
