package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture construction — the "data mixing" stage of a training
  * pipeline: given per-source TOKEN budgets (a mixture spec like
  * "30 B tokens of web, 10 B of code"), select a deterministic subset of
  * each source that fills its budget.
  *
  * Selection rule: within each source, docs are ordered by the portable
  * content-addressed hash ([[Sampling.hashBucket]] — sha256-prefix, so
  * membership survives reruns, repartitions, and engines) and admitted
  * while the cumulative token count stays within budget. That is a
  * greedy PREFIX, not a knapsack: the first doc that overflows the
  * budget stops admission for its source (cum is monotone), so the
  * result is exactly reproducible from the spec alone — no "best fit"
  * search whose outcome depends on scan order. Budget utilisation is
  * within one document of full, which at corpus scale is noise.
  *
  * Scale shape (100 TB): token counting is a codegen'd projection; the
  * only shuffle is the per-source window (parallel across sources —
  * mixtures have few sources but each source's window is one ordered
  * partition; for a SINGLE source far bigger than one executor's
  * partition, pre-aggregate per hash-bucket and admit bucket-prefixes
  * first, then refine the boundary bucket — the two-level form of the
  * same rule). Sources absent from the spec are dropped — a mixture
  * lists what it wants.
  */
object Mixing {

  /** Docs admitted under `budgets` (source → max tokens), with their
    * token counts in `__tok`. `tokensCol` is any integer token-count
    * expression over the row (e.g. `TextOps.tokenCount(col("text"))` or
    * a precomputed column). A NULL token count is pinned to ZERO before
    * the window — window `sum` would otherwise skip the row, silently
    * admitting a doc of unknown token mass without charging the budget
    * (the accounting must stay exact even over gappy inputs; a caller
    * who wants null-count docs excluded filters them first). */
  def tokenBudgetMixture(docs: DataFrame, budgets: Map[String, Long],
                         tokensCol: Column, sourceCol: String = "source",
                         idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.hashBucket(col(idCol), 1 << 30), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__tok", coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("__budget", element_at(typedlit(budgets), col(sourceCol)))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__budget").isNotNull && col("__cum") <= col("__budget"))
      .drop("__budget", "__cum")
  }
}
