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
}
