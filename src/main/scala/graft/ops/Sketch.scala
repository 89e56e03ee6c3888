package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching. At 100 TB "how many distinct X"
  * is a planning input (shuffle sizing, dedup forecasting, vocabulary
  * budgets) long before it is a report number, and the exact answer
  * costs a corpus-wide distinct shuffle. The KMV (k-minimum-values)
  * estimator gets within ~1/sqrt(k-2) relative error for the price of
  * a per-partition k-bounded buffer: each partition's partial
  * aggregate keeps its k smallest distinct hashes and only those ≤ k
  * longs per partition ever move. No shuffle of the data, no hash
  * table proportional to the cardinality (the HyperLogLog
  * alternative, approx_count_distinct,
  * is engine-specific in its register layout and therefore can't be
  * oracle-checked across engines; KMV's k-th order statistic is
  * exactly reproducible anywhere that can hash and sort).
  *
  * Estimator (Bar-Yossef et al. 2002): hash each key uniformly into
  * [0, 2^60) (md5 hex prefix — the repo's engine-portable 60-bit
  * integer hash, same construction as the winnowing oracle hash),
  * keep the k smallest DISTINCT hash values; if the k-th smallest is
  * `h_k`, the distinct count is ≈ (k-1) * 2^60 / h_k. All arithmetic
  * to the estimate is IEEE double ((k-1) and 2^60 are exactly
  * representable; one multiply, one divide, one floor) so an oracle
  * reproduces it bit-for-bit.
  *
  * Both variants run through [[graft.expressions.KMinDistinct]], the
  * k-bounded TypedImperativeAggregate: distinctness lives INSIDE the
  * k-sized buffer, partial aggregation trims map-side, and only ≤ k
  * longs per partition (per group) ever reach the exchange. The
  * earlier global spelling (`distinct().orderBy(h).limit(k)`) was
  * k-bounded at the TakeOrdered step but paid a corpus-cardinality
  * distinct exchange first — ~10^12 hash rows at 100 TB; the
  * aggregate form moves ~k·partitions rows total.
  *
  * Output: ONE row (k, kth_hash, est_distinct). Pass
  * `withExact = true` in tests/small runs to append the true
  * distinct count for error inspection — that branch DOES pay the
  * exact-distinct aggregation and is not the 100 TB path.
  */
object Sketch {

  /** 60-bit portable uniform hash of a column (md5 hex prefix). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** (k_used, kth_hash) -> estimated distinct count, shared by the
    * global and per-group variants. Exact when the sketch saw fewer
    * than k distinct hashes (it then holds ALL of them). */
  private def estimate(kUsed: Column, kthHash: Column, k: Int): Column =
    when(kUsed < lit(k.toLong), kUsed)
      .otherwise(floor((kUsed.cast("double") - lit(1.0))
        * lit(1.152921504606846976e18)
        / kthHash.cast("double")).cast("long"))

  def kmvDistinct(df: DataFrame, key: Column, k: Int = 256,
                  withExact: Boolean = false): DataFrame = {
    require(k >= 16, "KMV needs k >= 16 for a usable error bound")
    // Global (no-key) KMinDistinct: one partial-agg pass, ≤ k longs per
    // partition cross the exchange, single k-bounded final merge. No
    // distinct() pre-pass — the buffer IS the distinct set.
    val est = df.agg(kMins(key, k).as("mins"))
      .select(
        size(col("mins")).cast("long").as("k_used"),
        // empty input ⇒ empty array; guard element_at for ANSI mode
        when(size(col("mins")) > 0, element_at(col("mins"), -1))
          .as("kth_hash"))
      // fewer than k distinct hashes in the buffer ⇒ the sketch SAW
      // every distinct value and the count is exact, not estimated
      .select(col("k_used"), col("kth_hash"),
        estimate(col("k_used"), col("kth_hash"), k).as("est_distinct"))
    if (!withExact) est
    else {
      val exact = df.select(key.as("x")).agg(countDistinct(col("x")).as("n_exact"))
      est.crossJoin(broadcast(exact))
    }
  }

  /** The k-smallest-distinct-hashes aggregate column shared by both
    * variants. */
  private def kMins(key: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(
      graft.expressions.KMinDistinct(GraftSqlShim.expression(hash60(key)), k)
        .toAggregateExpression())
  }

  /** EXACT heavy hitters in two bounded passes — every `key` value
    * whose occurrence count strictly exceeds n/`denom` (n = non-null
    * rows), with its exact count. "Which tokens/domains/shingles
    * dominate the corpus" is a routine 100 TB curation question, and
    * the naive answer (`groupBy(key).count` then filter) shuffles one
    * row per DISTINCT key — vocabulary-cardinality, the same unbounded
    * exchange [[kmvDistinct]] exists to avoid.
    *
    * Pass 1 runs [[graft.expressions.MisraGries]] (capacity
    * k = denom·`slack` ≥ denom) over the 60-bit key hashes as a global
    * aggregate: ≤ k counters per partition map-side, one 1-row result.
    * The MG bound guarantees every key with count > n/(k+1) ⊇
    * count > n/denom still holds a counter after arbitrary merging, so
    * the ≤ k candidate hashes are a SUPERSET of the true heavy
    * hitters. Pass 2 re-scans, keeps only rows whose key hash is in
    * the candidate set (an InSet of ≤ k literals — codegen'd, no
    * join), and exact-counts just those: the groupBy touches ≤ k
    * distinct keys, so its exchange is k-bounded too. The final
    * `cnt·denom > n` filter is exact integer arithmetic — hash
    * collisions can only ADD candidates (a colliding light key rides
    * along, then fails the exact threshold), never lose one, so the
    * output is exactly the true heavy-hitter set on any engine.
    *
    * Two scans of the corpus, zero unbounded state — the standard
    * trade for exactness at scale. Output: (item, cnt), the caller
    * orders.
    */
  def heavyHitters(df: DataFrame, key: Column, denom: Int,
                   slack: Int = 2): DataFrame = {
    require(denom >= 2, "heavyHitters needs denom >= 2")
    require(slack >= 1, "heavyHitters needs slack >= 1")
    val k = denom * slack
    val keyed = df.select(key.as("item")).filter(col("item").isNotNull)
    // 1-row aggregate collect (candidates + total), the allowed pattern
    val row = keyed.agg(
      mgCandidates(col("item"), k).as("cand"),
      count(lit(1)).as("n")).head()
    val cand: Seq[Any] = row.getSeq[Long](0)
    val n = row.getLong(1)
    keyed
      .filter(hash60(col("item")).isin(cand: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom.toLong) > lit(n))
  }

  /** EXACT heavy hitters PER GROUP — every key whose in-group count
    * strictly exceeds n_g/`denom`, with exact counts: "which tokens
    * dominate each language", "which URLs dominate each domain". The
    * GROUP BY form of [[heavyHitters]], same two-pass discipline:
    * pass 1 aggregates ≤ k = denom·slack MG counters per group
    * (k-bounded map-side, one exchange of partial sketches), yielding
    * the (group, candidates, n_g) table; pass 2 probes the corpus
    * against the EXPLODED candidate hashes via a broadcast join on
    * (group, hash) — the corpus never shuffles; only the
    * groups×k-bounded exact counts do — then applies the exact integer
    * threshold. The MG superset bound makes the result identical to
    * the full per-group GROUP BY / HAVING answer.
    *
    * The candidate table must stay broadcast-sized (groups·k rows) —
    * the same deliberate envelope as the t-closeness verdict table;
    * with millions of groups, run [[heavyHitters]] per partition-pruned
    * group subset instead. Output: (groupCols*, item, cnt, group_n).
    */
  def heavyHittersBy(df: DataFrame, groupCols: Seq[String], key: Column,
                     denom: Int, slack: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "heavyHittersBy needs a group column")
    require(denom >= 2 && slack >= 1, "heavyHittersBy needs denom >= 2, slack >= 1")
    val k = denom * slack
    val gc = groupCols.map(col)
    val keyed = df.select(gc :+ key.as("item"): _*).filter(col("item").isNotNull)
    val cand = keyed.groupBy(gc: _*)
      .agg(mgCandidates(col("item"), k).as("__cand"),
        count(lit(1)).as("group_n"))
    val candExploded = cand.select(
      groupCols.map(n => col(n).as(s"__g_$n")) :+
        explode(col("__cand")).as("__h") :+ col("group_n"): _*)
    keyed
      // <=> on the group columns: GROUP BY treats NULL as a real group
      // in pass 1, so pass 2's probe join must match it too — plain ===
      // would silently drop a NULL group's heavy hitters (r11 advice).
      .join(broadcast(candExploded),
        groupCols.map(n => col(n) <=> col(s"__g_$n"))
          .reduce(_ && _) && hash60(col("item")) === col("__h"))
      .groupBy(gc :+ col("item") :+ col("group_n"): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom.toLong) > col("group_n"))
      .select(gc ++ Seq(col("item"), col("cnt"), col("group_n")): _*)
  }

  /** Per-group Misra–Gries candidate frequent-key hashes: for each
    * group, the ≤ k candidate 60-bit key hashes guaranteed to include
    * every key with in-group frequency > n_g/(k+1). The GROUP BY form
    * of [[heavyHitters]]' pass 1 — and, because the buffer is a
    * k-bounded `TypedImperativeAggregate` that round-trips the
    * streaming state store, the shape for streaming trending-key
    * candidates per window/group (an exact second pass can then run
    * against any batch snapshot). Output: (groupCols*, candidates
    * ARRAY<BIGINT> sorted ascending).
    */
  def frequentCandidatesBy(df: DataFrame, groupCols: Seq[String], key: Column,
                           k: Int): DataFrame = {
    require(groupCols.nonEmpty, "frequentCandidatesBy needs a group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(mgCandidates(key, k).as("candidates"))
  }

  /** The Misra–Gries candidate-keys aggregate column. */
  private def mgCandidates(key: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(
      graft.expressions.MisraGries(GraftSqlShim.expression(hash60(key)), k)
        .toAggregateExpression())
  }

  /** Per-group KMV distinct-cardinality estimates — "distinct texts
    * per source", "distinct URLs per domain": the GROUP BY form of
    * [[kmvDistinct]], and at 100 TB the form that actually gets asked.
    *
    * The single-group variant leans on TakeOrderedAndProject for its
    * "only k rows per partition move" guarantee; no composition of
    * built-ins gives that guarantee under a GROUP BY (`collect_set`
    * buffers whole groups, a `row_number` window sorts whole groups),
    * so the k-bound lives in a custom `TypedImperativeAggregate`,
    * [[graft.expressions.KMinDistinct]]: partial aggregation trims to
    * the k smallest distinct hashes map-side, so the exchange carries
    * at most k longs per (partition, group) — ONE shuffle, k-bounded
    * rows, no distinct() pre-pass, no window sort anywhere.
    *
    * Output: one row per group — (groupCols*, k_used, kth_hash,
    * est_distinct); exact below k, ~1/sqrt(k-2) relative error above.
    */
  def kmvDistinctBy(df: DataFrame, groupCols: Seq[String], key: Column,
                    k: Int = 256): DataFrame = {
    require(k >= 16, "KMV needs k >= 16 for a usable error bound")
    require(groupCols.nonEmpty, "kmvDistinctBy needs at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(kMins(key, k).as("mins"))
      .select(groupCols.map(col) ++ Seq(
        size(col("mins")).cast("long").as("k_used"),
        element_at(col("mins"), -1).as("kth_hash")): _*)
      .withColumn("est_distinct",
        estimate(col("k_used"), col("kth_hash"), k))
  }

  /** Corpus overlap matrix — pairwise distinct-`key` Jaccard between
    * every two groups ("how much vocabulary / content do two sources
    * share"), the dataset-composition question behind mixture design
    * and contamination triage. One corpus pass builds a k-bounded KMV
    * sketch per group (the [[kmvDistinctBy]] aggregate — ≤ k longs per
    * group cross the one exchange); the pairwise stage then works
    * entirely on the groups²-bounded sketch table (a broadcast
    * nested-loop self-pair of a tiny frame — deliberate, the envelope
    * is groups ≪ corpus, same as the t-closeness verdict table).
    *
    * KMV set algebra: the k smallest of the union's distinct hashes
    * are `merged = first k of sortedDistinct(ma ++ mb)`; the union
    * cardinality estimator is the usual (k−1)/kth-hash on `merged`,
    * and `inter` counts union-sample members present in BOTH sketches,
    * so `jaccard = inter / |merged|` is the standard ratio estimator.
    * When the two groups' distinct-key UNION fits strictly below k,
    * the sketches ARE the distinct hash sets and every figure is EXACT
    * (`exact` = true)
    * — the oracle-pinned branch; above k the same expressions are the
    * ~1/sqrt(k) estimators (modulo the negligible 60-bit hash
    * collision caveat of [[hash60]]).
    *
    * Output: (src_a, src_b, n_a, n_b, inter, uni, jaccard, exact) with
    * src_a < src_b.
    */
  def overlapMatrix(df: DataFrame, groupCol: String, key: Column,
                    k: Int = 256): DataFrame = {
    require(k >= 16, "KMV needs k >= 16 for a usable error bound")
    val sk = df.groupBy(col(groupCol)).agg(kMins(key, k).as("mins"))
    val a = sk.select(col(groupCol).as("src_a"), col("mins").as("ma"))
    val b = sk.select(col(groupCol).as("src_b"), col("mins").as("mb"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("du", array_sort(array_distinct(concat(col("ma"), col("mb")))))
      .withColumn("merged", slice(col("du"), 1, k))
      .withColumn("inter",
        size(filter(col("merged"), h =>
          array_contains(col("ma"), h) && array_contains(col("mb"), h)))
          .cast("long"))
      .select(
        col("src_a"), col("src_b"),
        estimate(size(col("ma")).cast("long"), element_at(col("ma"), -1), k)
          .as("n_a"),
        estimate(size(col("mb")).cast("long"), element_at(col("mb"), -1), k)
          .as("n_b"),
        col("inter"),
        estimate(size(col("merged")).cast("long"), element_at(col("merged"), -1), k)
          .as("uni"),
        when(size(col("merged")) === 0, lit(0.0))
          .otherwise(col("inter").cast("double") / size(col("merged")).cast("double"))
          .as("jaccard"),
        // exact iff the union itself fits strictly below k: then both
        // sketches held ALL their distinct hashes AND merged == union
        (size(col("du")) < k).as("exact"))
  }

  /** Per-group QUANTILES from a deterministic bottom-k-by-hash row
    * sample — the bounded-state quantile path this sketch family was
    * missing (exact `percentile` buffers whole groups; GK/t-digest
    * summaries are insertion-order-dependent, so two runs disagree in
    * the last ulp and no SQL oracle can replay them). Ranking rows by
    * the portable content hash of their id ([[Sampling.hashBucket]])
    * gives a uniform sample whose MEMBERSHIP is a pure function of the
    * data — order-independent, rerun-stable, engine-replayable — and
    * the exact percentile of that sample is the estimate (±O(1/√k)
    * quantile error, the standard sample bound). EXACT whenever the
    * group has ≤ k rows, the same exact-below-capacity contract as
    * [[kmvDistinctBy]] / the Misra–Gries pass.
    *
    * Scale shape: the rank filter compiles to WindowGroupLimit — k
    * rows per group per partition cross the exchange, never the
    * group's population; the percentile buffers only the k-row sample.
    *
    * Output: (groupCol, n_sample, q_<p> per requested prob). */
  def sampleQuantiles(df: DataFrame, groupCol: String, valueCol: Column,
                      idCol: String, k: Int,
                      probs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0,1]: $probs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Sampling.hashBucket(col(idCol), 1 << 30), col(idCol))
    val sampled = df
      .select(col(groupCol), col(idCol), valueCol.as("__v"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    val qCols = probs.map(p =>
      expr(s"percentile(__v, $p)").as(s"q_${(p * 100).round}"))
    sampled.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_sample"), qCols: _*)
  }

  /** Count-min sketch point-frequency estimates (Cormode &
    * Muthukrishnan 2005) — "roughly how often does each of THESE keys
    * occur" over a key space too large to count exactly: the one-pass
    * bounded-state complement of [[heavyHitters]] (which finds the
    * keys; this prices an externally-given probe list, e.g. a
    * blocklist, a vocabulary candidate set, a join-key sample for
    * skew planning).
    *
    * Spark-first observation: the CMS grid IS a partial-aggregated
    * groupBy. Each occurrence contributes `depth` (row, bucket) cells;
    * aggregating counts by cell is exactly the sketch build, and
    * map-side combine bounds every exchange to ≤ depth·width rows per
    * partition — the property a custom sketch buffer would buy,
    * already free in the engine. The estimate for a probe key is the
    * MIN over its depth cells (classic CMS upper bound: est >= true,
    * over by collisions only).
    *
    * Hashes are the engine-portable sha256-prefix construction keyed
    * by row index (`i:key`), so an external SQL engine reproduces the
    * grid — and therefore every estimate — bit-for-bit (the q23/q48
    * discipline; estimates are integers, no float anywhere).
    *
    * Scale shape: one corpus scan, one depth·width-bounded exchange;
    * the grid (≤ depth·width rows total) broadcasts to the probe side;
    * probes stay probe-sized. `depth` trades collision probability
    * (P[over by > eps·N] <= exp(-depth) at width = e/eps), `width`
    * trades memory for accuracy — size width ≈ e·N/acceptable_error.
    *
    * Output: one row per distinct probe key — (key, est_count),
    * est_count = 0 iff no probe-cell was ever touched. */
  def cmsFrequency(df: DataFrame, key: Column, probes: DataFrame,
                   probeCol: String, depth: Int = 4,
                   width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 16, s"width must be >= 16: $width")
    def cell(i: Column, k: Column): Column =
      pmod(conv(substring(sha2(concat(i.cast("string"), lit(":"),
        k.cast("string")), 256), 1, 15), 16, 10).cast("long"), lit(width.toLong))
    val grid = df.select(key.cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"), explode(sequence(lit(0), lit(depth - 1))).as("__i"))
      .groupBy(col("__i"), cell(col("__i"), col("__k")).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val probeCells = probes
      .select(col(probeCol).cast("string").as("key")).distinct()
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("__i"))
      .withColumn("__b", cell(col("__i"), col("key")))
    probeCells
      .join(broadcast(grid), Seq("__i", "__b"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("__c"), lit(0L))).cast("long").as("est_count"))
  }
}
