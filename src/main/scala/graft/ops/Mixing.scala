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

  /** TEMPERATURE-scaled mixture — [[tokenBudgetMixture]] with the
    * per-source budgets DERIVED from the corpus instead of hand-listed:
    * source `s` gets `totalBudget · w_s / Σw` where `w_s =
    * floor(sqrt(tokens_s))` — the τ=2 temperature-sampling rule
    * (weight ∝ size^(1/τ)) that every multilingual/multi-source
    * training recipe uses to up-weight small sources without letting
    * the largest source dominate. The exponent is fixed at ½
    * deliberately: `sqrt` is IEEE-754 correctly rounded on every
    * engine, so `floor(sqrt(x))` is an exact integer cross-engine,
    * whereas a general `pow(x, 1/τ)` is libm-dependent — the budget
    * arithmetic stays all-integer after the one sqrt (the oracle-parity
    * rule). Budgets use integer division, so up to `nSources−1` tokens
    * of `totalBudget` go unassigned — noise at corpus scale.
    *
    * Fully distributed — no driver collect: sizes are one per-source
    * partial agg; the one-row ΣW frame and the per-source budget frame
    * are broadcast back (both are #sources-sized); admission is the
    * same per-source hash-order prefix window as the explicit-budget
    * form. Every source present in `docs` participates (a temperature
    * mixture reweights the whole corpus — dropping a source is the
    * explicit form's job).
    *
    * Output: the admitted docs with `__tok` (the charged token count)
    * and `__budget` (the derived per-source budget) retained — the
    * caller can audit utilisation per source. */
  def temperatureMixture(docs: DataFrame, totalBudget: Long,
                         tokensCol: Column, sourceCol: String = "source",
                         idCol: String = "doc_id"): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val d = docs.withColumn("__tok", coalesce(tokensCol.cast("long"), lit(0L)))
    val weights = d.groupBy(col(sourceCol))
      .agg(sum(col("__tok")).as("__src_tokens"))
      .withColumn("__w", floor(sqrt(col("__src_tokens").cast("double"))))
    val totalW = weights.agg(sum(col("__w")).as("__tw"))
    // integer DIV keeps the budget arithmetic exact (a double `/` would
    // round w·B near 2^53); guarded against an all-empty corpus
    val budgets = weights.crossJoin(broadcast(totalW))
      .withColumn("__budget",
        when(col("__tw") > 0,
          expr("__w * " + totalBudget + "L DIV __tw")).otherwise(lit(0L)))
      .select(col(sourceCol), col("__budget"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.hashBucket(col(idCol), 1 << 30), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(budgets), sourceCol)
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") <= col("__budget"))
      .drop("__cum")
  }

  /** MULTI-EPOCH mixture — the case [[tokenBudgetMixture]] cannot
    * express: a source whose budget EXCEEDS its size ("1.4 epochs of
    * Wikipedia" in the usual recipe language). Every doc of source `s`
    * repeats `budget_s DIV tokens_s` times (full epochs), and the
    * fractional epoch is the same deterministic hash-order prefix as
    * the budget mixture, charged against `budget_s MOD tokens_s`
    * remainder tokens. All-integer arithmetic; a budget smaller than
    * the source degenerates to exactly [[tokenBudgetMixture]]'s
    * selection (0 full epochs + prefix).
    *
    * Emits `repeat_count >= 1` rather than physically exploding rows —
    * the downstream shard writer multiplies (exploding 3.7 epochs of a
    * 10 TB source into 37 TB of shuffle is the anti-pattern; the count
    * column is free). Docs with repeat_count 0 are dropped.
    *
    * Scale shape: one per-source token-sum aggregate broadcast back,
    * then the same single per-source window as the other mixtures —
    * the remainder prefix needs the cumulative sum anyway, so the
    * full-epoch add rides the same exchange. Zero-token docs never
    * enter the remainder prefix (they'd inflate repeat counts for
    * free) but DO ride full epochs like any other doc.
    *
    * Output: the input columns plus `plan_tokens` (the long token count
    * this doc is charged at per repeat — the evaluated `tokensCol`,
    * surfaced so the shard writer can compute planned volume as
    * `repeat_count * plan_tokens` without re-tokenizing) and
    * `repeat_count >= 1`. */
  def epochMixture(docs: DataFrame, budgets: Map[String, Long],
                   tokensCol: Column, sourceCol: String = "source",
                   idCol: String = "doc_id"): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(!docs.columns.contains("plan_tokens") &&
      !docs.columns.contains("repeat_count") &&
      !docs.columns.contains("__tok"),
      "epochMixture emits plan_tokens/repeat_count and uses __tok internally; rename the input's")
    val d = docs
      .withColumn("__tok", coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("__budget", element_at(typedlit(budgets), col(sourceCol)))
      .filter(col("__budget").isNotNull)
    val sizes = d.groupBy(col(sourceCol))
      .agg(sum(col("__tok")).as("__src_tokens"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.hashBucket(col(idCol), 1 << 30), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(sizes), sourceCol)
      .withColumn("__epochs",
        when(col("__src_tokens") > 0,
          expr("__budget DIV __src_tokens")).otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__src_tokens") > 0,
          expr("__budget % __src_tokens")).otherwise(lit(0L)))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .withColumn("repeat_count",
        col("__epochs") + when(col("__tok") > 0 && col("__cum") <= col("__rem"),
          lit(1L)).otherwise(lit(0L)))
      .filter(col("repeat_count") >= 1)
      .drop("__budget", "__src_tokens", "__epochs", "__rem", "__cum")
      .withColumnRenamed("__tok", "plan_tokens")
  }
}
