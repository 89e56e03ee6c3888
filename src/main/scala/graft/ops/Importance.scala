package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
  * in EXACT fixed-point arithmetic: score every raw document by how
  * much its hashed-bigram features look like a target distribution,
  * so a pipeline can resample raw crawl data toward a trusted corpus.
  *
  * The published estimator weights each feature by
  * log(p_target(f)/p_raw(f)); a float log is engine-specific in its
  * last ulps, so the score here is the same quantity in fixed point:
  * [[fixLog2]] computes floor(2^8 · log2(x)) of an integer with
  * nothing but integer multiply/shift/compare (the classic binary
  * logarithm by squaring), and every probability is a ratio of
  * integer counts under add-one smoothing. Both engines run the
  * identical unrolled integer recurrence, so scores are bit-equal
  * by construction — the BM25 rational-idf discipline (q86), applied
  * to logarithms.
  *
  * Scale shape: feature extraction is the linear
  * [[TextOps.ngramOccurrences]] pass; bucket counts partial-aggregate
  * to `buckets`-bounded rows before their exchange; the weight table
  * is `buckets` rows (broadcast), so scoring is scan + broadcast-join
  * + partial-agg sum per doc — no corpus-sized shuffle anywhere. The
  * 60-bit feature hash caps counts far below the 2^46 overflow bound
  * of the fixed-point normalizer at any corpus size (counts would
  * need ~10^13 occurrences in ONE bucket to approach it; raise
  * `buckets` long before that).
  */
object Importance {

  /** floor(2^8 · log2(x)) for a positive integer column, exact — the
    * native [[graft.expressions.FixLog2Expr]] (a column-arithmetic
    * spelling of the 8-step squaring recurrence grows an ~8^8-node
    * expression tree; the native expression is one node and one
    * codegen'd static call). Requires 1 ≤ x < 2^46. */
  def fixLog2(x: Column): Column =
    GraftSqlShim.column(
      graft.expressions.FixLog2Expr(GraftSqlShim.expression(x.cast("long"))))

  /** hashed-bigram feature bucket of a gram string: hash60 mod buckets */
  private def bucketOf(g: Column, buckets: Int): Column =
    pmod(Sketch.hash60(g), lit(buckets.toLong))

  private def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
                           buckets: Int, alias: String): DataFrame =
    TextOps.ngramOccurrences(docs, idCol, textCol, n = 2)
      .groupBy(bucketOf(col("g"), buckets).as("bucket"))
      .agg(count(lit(1)).as(alias))

  /** Per-bucket importance weight table: (bucket, ct, cr, w) with
    * w = fixlog2((ct+1)/(Nt+B)) − fixlog2((cr+1)/(Nr+B)) expanded into
    * four integer [[fixLog2]] terms (a log of a ratio is a difference
    * of integer logs — no division ever happens). `buckets` rows total:
    * broadcast-sized at any corpus scale.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, "importanceWeights needs >= 2 buckets")
    val spine = raw.sparkSession.range(buckets.toLong)
      .select(col("id").as("bucket"))
    val counts = spine
      .join(bucketCounts(target, idCol, textCol, buckets, "ct"), Seq("bucket"), "left")
      .join(bucketCounts(raw, idCol, textCol, buckets, "cr"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ct"), col("cr"),
        (fixLog2(col("ct") + lit(1L)) - fixLog2(col("nt") + lit(buckets.toLong))
          - fixLog2(col("cr") + lit(1L)) + fixLog2(col("nr") + lit(buckets.toLong)))
          .as("w"))
  }

  /** Per-document importance score: Σ over bigram OCCURRENCES of the
    * bucket weight (occurrence multiplicity IS the feature count, so
    * no per-doc feature vector is ever materialized). Docs with fewer
    * than two tokens have no features and score 0. Output:
    * (idCol, score, n_bigrams).
    */
  def importanceScores(raw: DataFrame, target: DataFrame,
                       idCol: String, textCol: String,
                       buckets: Int = 4096): DataFrame = {
    val w = importanceWeights(raw, target, idCol, textCol, buckets)
      .select(col("bucket"), col("w"))
    val scored = TextOps.ngramOccurrences(raw, idCol, textCol, n = 2)
      .select(col(idCol), bucketOf(col("g"), buckets).as("bucket"))
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_bigrams"))
    raw.select(col(idCol).cast("long").as(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }
}
