package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — the query side of the inverted-index /
  * RAG story ([[TextOps.invertedIndex]] builds the index; this scores
  * it). BM25 is the standard lexical ranking function for passage
  * retrieval over a training corpus: dedup triage ("show me the docs
  * most like this boilerplate"), eval-set leakage investigation, and
  * RAG candidate generation all run this exact computation.
  *
  * Scale shape (the reason this is an operator and not a notebook
  * one-liner): the corpus token stream is touched ONCE, filtered to
  * the query vocabulary BEFORE the tf shuffle (the explode stream
  * that reaches the exchange is |matches|, not |tokens|), document
  * frequencies reduce to |query| rows and travel by broadcast, the
  * corpus-wide (N, avgdl) statistic is ONE 1-row aggregate joined by
  * broadcast cross-join, and the final top-k compiles to
  * TakeOrderedAndProject (per-partition heap, never a global sort).
  * Nothing in the plan is proportional to anything but the corpus
  * scan plus |matching docs|.
  *
  * ORACLE PARITY: BM25's classic idf is a log — libm-dependent, so an
  * engine-portable oracle can't pin it bit-for-bit. This uses the
  * RATIONAL idf `(N - df + 0.5) / (df + 0.5)` (the odds ratio inside
  * Robertson's log, monotone in it, so rankings are BM25 rankings)
  * and fixes k1 = 1.2, b = 0.75 as source literals: every arithmetic
  * step is IEEE +,*,/ with literals that parse to identical doubles
  * in any engine, and the per-doc sum folds term weights in TOKEN
  * ORDER via `aggregate(array_sort(...))` — the same bit-exact-fold
  * discipline as [[Ann.marginScores]]. (`lit(2.2)` is deliberately a
  * literal, not `k1 + 1` computed: `1.2 + 1.0` rounds to a DIFFERENT
  * double than the parsed literal `2.2`.)
  *
  * Mirrors the reference's lens-powered search views (a map over the
  * corpus feeding a ranked reduce —
  * /root/reference/library/models/lens.js) re-expressed as one
  * declarative ranking query.
  *
  * Output: (idCol, n_terms, score) — top `topK` by (score DESC, id).
  */
object Retrieval {

  def bm25TopK(docs: DataFrame, query: Seq[String], topK: Int = 20,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = query.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.sorted
    require(terms.nonEmpty, "bm25TopK needs at least one query term")

    // per-doc token length — needed for every doc (it feeds avgdl),
    // computed in the same scan codegen stage as the source read
    val dl = docs.select(col(idCol),
      TextOps.tokenCount(col(textCol)).cast("long").as("dl"))

    // 1-row corpus statistic; joined below via broadcast cross-join
    // (the Mixing.scala pattern — no shuffle, no skew, no collect)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))

    // tf over QUERY TERMS ONLY: the isin filter runs inside the same
    // codegen stage as the explode, so only matching (id, token) rows
    // ever reach the partial-agg exchange
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

    // document frequency: |query| rows, derived from the tf frame
    // (no second corpus scan), broadcast back onto it
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

    val w = ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
              / (col("df").cast("double") + lit(0.5))) *
            ((col("tf").cast("double") * lit(2.2))
              / (col("tf").cast("double")
                 + lit(1.2) * (lit(0.25)
                   + lit(0.75) * (col("dl").cast("double") / col("avgdl")))))

    tf.join(broadcast(dfreq), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("w", w)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_terms"),
        aggregate(
          array_sort(collect_list(struct(col("token"), col("w").as("w")))),
          lit(0.0),
          (acc, x) => acc + x.getField("w")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("n_terms"), col("score"))
  }

  /** Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) — the
    * standard way to combine a lexical ranking ([[bm25TopK]]) with a
    * semantic one ([[Ann.topKByDot]]) into one hybrid retrieval list:
    * rrf(d) = Σ_lists 1/(kRrf + rank_list(d)), kRrf = 60 per the
    * paper. Rank positions are all that crosses between retrievers, so
    * incomparable score scales (BM25 vs cosine) never need calibration.
    *
    * Exactness: each term is ONE IEEE division of small exact
    * integers and the per-doc fold adds terms in `src_list`-name order
    * via the sorted-fold discipline ([[bm25TopK]]'s scoring sum) —
    * basic double arithmetic is correctly rounded on every engine, so
    * fused scores are bit-equal without any rational trickery.
    *
    * Scale shape: inputs are already top-k lists (k·lists rows
    * total) — the union, the k-bounded collect_list (≤ one struct per
    * input list), and the final TakeOrdered all run on candidate-set
    * cardinality, never corpus cardinality. The heavy lifting stays in
    * the upstream retrievers.
    *
    * `rankings` maps a DISTINCT list name to a DataFrame bearing
    * (idCol, rankCol); ranks are 1-based positions. Output:
    * (idCol, n_lists, rrf), top `topK` by (rrf DESC, id).
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              rankCol: String = "rank", kRrf: Int = 60,
              topK: Int = 20): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "rrfFuse list names must be distinct")
    val tagged = rankings.map { case (name, df) =>
      df.select(col(idCol), lit(name).as("src_list"),
        col(rankCol).cast("long").as("rank"))
    }
    tagged.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_lists"),
        aggregate(
          array_sort(collect_list(struct(col("src_list"), col("rank")))),
          lit(0.0),
          (acc, x) => acc + lit(1.0)
            / (lit(kRrf.toDouble) + x.getField("rank").cast("double")))
          .as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
