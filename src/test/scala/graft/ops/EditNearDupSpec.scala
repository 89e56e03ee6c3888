package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.SparkTestBase

/** Edit-distance near-dup join: brute-force equality (the prefix filter
  * must be lossless), domain floor, adversarial repetitive strings,
  * randomized differential check, cap observability, and the plan
  * invariants (gram-df broadcast, no cartesian product). */
class EditNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.DataFrame

  private def brute(df: DataFrame, maxDist: Int, q: Int): Set[(Long, Long, Long)] = {
    val strs = df.select(col("doc_id").cast("long"), col("s"))
      .filter(length(col("s")) >= q * (maxDist + 1))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib
      d = levDist(sa, sb) if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def run(df: DataFrame, maxDist: Int = 2, q: Int = 3) =
    Dedup.editNearDupPairs(df, col("s"), maxDist = maxDist, q = q)
      .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long, Long)])
      .collect().toSet

  test("matches brute force on a hand fixture; short strings excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fux"),     // dist 1 from 1
      (3L, "the quick brown foxes"),   // dist 2 from 1, 3 from 2
      (4L, "a completely different"),
      (5L, "short"),                   // below 9-char floor: excluded
      (6L, "shorx")                    // would be dist 1 of 5 — excluded
    ).toDF("doc_id", "s")
    val got = run(df)
    assert(got == brute(df, 2, 3))
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("repetitive strings (tiny gram sets) stay lossless") {
    import spark.implicits._
    // |distinct grams| <= q·d for these, the prefix-equals-whole-set
    // branch of the filter theorem
    val df = Seq(
      (1L, "aaaaaaaaaaaa"), (2L, "aaaaaaaaaaab"), (3L, "aaaaaaaaabab"),
      (4L, "abababababab"), (5L, "abababababbb"), (6L, "bbbbbbbbbbbb")
    ).toDF("doc_id", "s")
    assert(run(df) == brute(df, 2, 3))
  }

  test("randomized differential: 120 mutated strings vs brute force") {
    import spark.implicits._
    val rnd = new Random(7)
    val bases = Seq.fill(12)(Random.alphanumeric.take(20).mkString.toLowerCase)
    val rows = (0 until 120).map { i =>
      val b = bases(rnd.nextInt(bases.size)).toCharArray
      // 0-3 random substitutions
      (0 until rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = ('a' + rnd.nextInt(26)).toChar
      }
      (i.toLong, new String(b))
    }
    val df = rows.toDF("doc_id", "s")
    assert(run(df) == brute(df, 2, 3))
  }

  test("maxDist=1 tightens the result, q=2 grams stay lossless") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world out there"), (2L, "hello warld out there"),
      (3L, "hello warld out thore")
    ).toDF("doc_id", "s")
    assert(run(df, maxDist = 1, q = 2) == brute(df, 1, 2))
    assert(run(df, maxDist = 1, q = 2) == Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }

  test("over-cap gram buckets drop pairs and the observation reports them") {
    import spark.implicits._
    // 6 near-identical strings: every one of their prefix gram buckets
    // holds all 6 (over the cap of 5) — their pairs drop, a real recall
    // loss this operator WARNs about (no band redundancy). A disjoint
    // under-cap pair must survive so the metrics subtree isn't elided
    // by empty-relation propagation (the CapStats scaladoc corner).
    val df = ((1L to 6L).map(i => (i, s"prefixprefixprefix$i")) ++
      Seq((11L, "zzqqzzqqzzqq1"), (12L, "zzqqzzqqzzqq2"))).toDF("doc_id", "s")
    val obs = new org.apache.spark.sql.Observation(s"edit_cap_${System.nanoTime}")
    val out = Dedup.editNearDupPairs(df, col("s"), maxBucketSize = 5,
        stats = Some(obs))
      .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long, Long)])
      .collect().toSet
    assert(out == Set((11L, 12L, 1L)))
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] > 0L)
    assert(m("max_bucket").asInstanceOf[Long] == 6L)
  }

  test("plan: gram-df joins broadcast; no cartesian product anywhere") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, s"document number $i with a tail"))
      .toDF("doc_id", "s")
    val plan = Dedup.editNearDupPairs(df, col("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
