package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered reference-set joins — the 100 TB shape for "drop
  * every corpus row whose key appears in a reference set" (eval-set
  * decontamination, blocklist gating, already-ingested dedup against
  * a prior corpus).
  *
  * The naive spelling is a shuffle LEFT ANTI join: BOTH sides
  * repartition on the key, i.e. the full 100 TB corpus crosses the
  * wire to reject a few matches. A broadcast anti-join avoids that
  * but ships an exact hash set (~50+ bytes/key — executor-memory
  * bound in the tens of millions of keys). The bloom filter is the
  * standard middle path (what Spark's own runtime row-level filtering
  * injects for shuffle joins): ~10 bits/key at 1% fpp, so 10⁸
  * reference keys ride in a ~120 MB task literal, and the corpus is
  * gated by a codegen'd `might_contain` WITHOUT any exchange. Bloom
  * negatives are DEFINITE non-members — they pass straight through.
  * Only bloom positives (true members + fpp·|corpus| false alarms)
  * continue into an exact anti-join for verification, so the join
  * input shrinks from |corpus| to |members| + fpp·|corpus| rows.
  *
  * The final result is EXACTLY the plain anti-join's (false positives
  * are weeded by the verify join; false negatives don't exist), so
  * correctness is independent of the filter's randomness — the oracle
  * is `WHERE NOT EXISTS`.
  *
  * Hash congruence contract: the filter is BUILT over
  * `xxhash64(refKey)` longs (BloomFilterImpl.putLong) and PROBED with
  * `BloomFilterMightContain(filterBytes, XxHash64(corpusKey))` — the
  * same pairing Spark's InjectRuntimeFilter uses; building and
  * probing must hash identically or every probe is garbage.
  *
  * Sizing: `fpp` trades filter bytes against verify-join input
  * (fpp·|corpus| extra rows); beyond ~10⁹ reference keys the filter
  * itself reaches GBs and the plain shuffle anti-join wins — this
  * operator does not try to hide that crossover.
  *
  * NULL corpus keys are bloom-agnostic and never equal a reference
  * key, so they survive — the same rows a plain LEFT ANTI keeps.
  */
object BloomJoin {

  /** Corpus rows whose `corpusKey` does NOT appear among `refKey`
    * values — bit-identical to `corpus LEFT ANTI JOIN ref`, computed
    * without shuffling the corpus. `expectedItems <= 0` sizes the
    * filter with one count(ref) job. */
  def bloomAntiJoin(corpus: DataFrame, ref: DataFrame,
                    corpusKey: Column, refKey: Column,
                    fpp: Double = 0.01,
                    expectedItems: Long = 0L): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    val n = if (expectedItems > 0) expectedItems
      else math.max(1L, ref.select(refKey).count())
    val bf = ref.select(xxhash64(refKey).as("__h")).stat
      .bloomFilter(col("__h"), n, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = GraftSqlShim.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      // seed 42 = functions.xxhash64's seed; build and probe MUST match
      XxHash64(Seq(GraftSqlShim.expression(corpusKey)), 42L)))
    // fresh attribute for the reference key so a ref derived from the
    // corpus itself (self-decontamination) can't resolve ambiguously
    val refKeys = ref.select(refKey.as("__ref_key")).distinct()
    val clean = corpus.filter(!mightContain)
    val suspects = corpus.filter(mightContain)
      .join(refKeys, corpusKey === col("__ref_key"), "left_anti")
    clean.unionByName(suspects)
  }
}
