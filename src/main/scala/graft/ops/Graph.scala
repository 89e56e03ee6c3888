package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over crawl metadata. PageRank is the classic
  * quality prior for web-corpus curation — per-domain authority is a
  * standard feature in "keep or drop this page" filters, and the graph
  * it runs on (registered-domain → registered-domain links) is exactly
  * what [[UrlOps.extractUrls]] + [[UrlOps.registeredDomain]] produce
  * from a crawled corpus.
  */
object Graph {

  /** Fixed-iteration PageRank.
    *
    * `nodes` is (id: long); `edges` is (src, dst) and is deduplicated —
    * multi-edges would double-count a link. Dangling nodes (no
    * out-edges) leak their rank mass, the standard simplification when
    * ranks are used as a relative quality prior rather than a true
    * probability (callers who need conservation add self-loops).
    *
    * Plan shape per iteration: one hash join of ranks onto the
    * edge list on `src`, one partial-aggregated groupBy on `dst`, one
    * left join back onto `nodes` (teleport-only rows). The edge list
    * (with out-degrees pre-joined) is computed ONCE and persisted —
    * iterations re-shuffle only rank rows (|V|, not |E|). Lineage is
    * truncated with `localCheckpoint` every `checkpointEvery`
    * iterations — same contract as [[Dedup.dupClusters]]: fine on a
    * single JVM and for small K; pass a reliable checkpoint dir via
    * `spark.sparkContext.setCheckpointDir` + `reliable = true` on a
    * 1000-executor cluster where executor loss must not kill the job.
    *
    * ORACLE PARITY (`exactFold = true`): the per-dst contribution sum
    * folds in src order via `aggregate(array_sort(collect_list(...)))`
    * — bit-reproducible anywhere (the q83/q86 fold discipline), at the
    * price of buffering each node's in-neighborhood in one array. The
    * default (`exactFold = false`) is a plain partial-aggregated
    * `sum` — the 100 TB path (hub pages have millions of in-links; a
    * collect_list over them is exactly the unbounded buffer the rest
    * of this repo avoids), non-associative only in the last ulp.
    * Every other arithmetic step is IEEE +,*,/ with pinned
    * parenthesization: contrib = rank/outdeg, then
    * teleport + damping * sum, teleport = (1-damping)/N.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int = 4,
               damping: Double = 0.85, exactFold: Boolean = false,
               reliable: Boolean = false, checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    val n = nodes.select(col("id").cast("long").as("id"))
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val ew = e.join(outdeg, "src").persist()
    val stats = n.agg(count(lit(1)).cast("double").as("n_nodes"))
    var ranks = n.crossJoin(broadcast(stats))
      .select(col("id"), (lit(1.0) / col("n_nodes")).as("pr"))
    for (i <- 1 to iterations) {
      val contribs = ew.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), col("src"),
          (col("pr") / col("outdeg")).as("contrib"))
      val sums =
        if (exactFold)
          contribs.groupBy(col("dst")).agg(
            aggregate(
              array_sort(collect_list(struct(col("src"), col("contrib").as("c")))),
              lit(0.0), (acc, x) => acc + x.getField("c")).as("s"))
        else
          contribs.groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
      ranks = n.join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(stats))
        .select(col("id"),
          (lit(1.0 - damping) / col("n_nodes")
            + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = if (reliable) ranks.checkpoint() else ranks.localCheckpoint()
    }
    // Final eager checkpoint so the persisted edge frame can be
    // RELEASED before returning — without it the lazy result pins `ew`
    // in the cache forever in a long-lived session (r11 hygiene pass);
    // callers always materialize anyway, so the work is the same.
    val out = if (reliable) ranks.checkpoint() else ranks.localCheckpoint()
    ew.unpersist(blocking = false)
    out
  }

  /** Fixed-iteration HITS (Kleinberg hubs & authorities).
    *
    * The natural complement to [[pageRank]] for crawl curation: a page
    * can be a poor authority but a valuable hub (link directories,
    * sitemaps, "awesome lists") — frontier schedulers seed from high-hub
    * pages while quality gates keep high-authority ones.
    *
    * `nodes` is (id: long); `edges` is (src, dst), deduplicated. Per
    * iteration: auth(v) = Σ_{u→v} hub(u), max-normalized, then
    * hub(u) = Σ_{u→v} auth(v), max-normalized. Max-normalization (not
    * the textbook L2) is chosen deliberately: `max` is order-independent
    * and every IEEE division by it is exact-in-place, so the whole
    * iteration is bit-reproducible across engines without a second
    * non-associative fold (an L2 norm would need its own exactFold).
    * Nodes with no in-links get auth 0.0, no out-links hub 0.0; at
    * least one edge is required so the max is positive.
    *
    * Plan shape per iteration: two hash joins of score rows onto the
    * persisted edge list (|V| rows shuffled, never |E| re-derived), two
    * partial-aggregated groupBys, two broadcast 1-row maxima. Unlike
    * [[pageRank]] (whose rank frame is consumed ONCE per iteration, so
    * lineage grows linearly), every HITS frame is consumed TWICE — the
    * sums feed both the max and the join, each score frame feeds the
    * next half-iteration and the output — so sums/hub/auth are
    * PERSISTED every iteration: without that the un-reused subtree
    * copies multiply 4× per iteration (recompute, not just plan text).
    * Same `exactFold` contract as [[pageRank]]: the default
    * partial-agg `sum` is the 100 TB path; `exactFold = true` buffers
    * each neighborhood in a sorted array for oracle-bit-exact
    * left-association (oracle mode only — hub pages have unbounded
    * in-degree).
    */
  def hits(nodes: DataFrame, edges: DataFrame, iterations: Int = 2,
           exactFold: Boolean = false,
           reliable: Boolean = false): DataFrame = {
    require(iterations >= 1, "hits needs at least one iteration")
    val n = nodes.select(col("id").cast("long").as("id"))
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().persist()

    // Σ over the neighborhood with the pinned parenthesization
    // (((0.0 + x1) + x2) + ...) in `ord` order when exactFold is on.
    def foldSum(df: DataFrame, key: String, ord: String): DataFrame = {
      val g = df.groupBy(col(key))
      val s =
        if (exactFold)
          g.agg(aggregate(
            array_sort(collect_list(struct(col(ord), col("c")))),
            lit(0.0), (acc, x) => acc + x.getField("c")).as("s"))
        else g.agg(sum(col("c")).as("s"))
      s.withColumnRenamed(key, "id")
    }
    // score / max(score), 0.0-filled for nodes outside the group-by.
    // Both `sums` (max + join) and the result (next half-iteration +
    // output) are double-consumed — the Pregel materialize-per-
    // superstep shape: every carried score frame is EAGERLY
    // checkpointed (localCheckpoint single-JVM, reliable on a
    // cluster), which (a) computes each frame exactly once, (b)
    // truncates the logical plan to a leaf so analysis cost stays O(1)
    // per iteration instead of doubling with every double-reference,
    // and (c) lets the sums temporary unpersist immediately; the
    // superseded frames' storage is reclaimed by the ContextCleaner
    // once unreferenced. An earlier persist-only form leaked every
    // iteration's cache and plans into long-lived sessions.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def normalized(sums0: DataFrame, out: String): DataFrame = {
      val sums = sums0.persist(lvl)
      val mx = sums.agg(max(col("s")).as("mx"))
      val r = n.join(sums, Seq("id"), "left").crossJoin(broadcast(mx))
        .select(col("id"),
          coalesce(col("s") / col("mx"), lit(0.0)).as(out))
      val m = if (reliable) r.checkpoint() else r.localCheckpoint()
      sums.unpersist(false)
      m
    }

    var hub = n.select(col("id"), lit(1.0).as("hub"))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      auth = normalized(foldSum(
        e.join(hub.withColumnRenamed("id", "src"), "src")
          .select(col("dst"), col("src"), col("hub").as("c")),
        "dst", "src"), "auth")
      hub = normalized(foldSum(
        e.join(auth.withColumnRenamed("id", "dst"), "dst")
          .select(col("src"), col("dst"), col("auth").as("c")),
        "src", "dst"), "hub")
    }
    // hub/auth are checkpointed leaves — the output no longer reads
    // the edge frame, so its cache entry is released here (r11 hygiene)
    e.unpersist(blocking = false)
    hub.join(auth, Seq("id")).select(col("id"), col("hub"), col("auth"))
  }

  /** Personalized PageRank / TrustRank (Gyöngyi et al. 2004): the
    * teleport distributes over a SEED set instead of uniformly — rank
    * flows outward from trusted (or spam) seeds, which is how crawl
    * pipelines propagate a small hand-labeled quality set over the
    * whole link graph.
    *
    * `seeds` is (id); rank initializes to 1/|S| on seeds, 0 elsewhere,
    * and each iteration adds teleport (1−d)/|S| on seeds only. Same
    * dangling-mass simplification, plan shape, `exactFold` contract and
    * checkpoint contract as [[pageRank]]; the seed flag joins on once
    * (broadcast — seed sets are small by definition) and rides the
    * node frame through every iteration.
    */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame,
                           seeds: DataFrame, iterations: Int = 4,
                           damping: Double = 0.85, exactFold: Boolean = false,
                           reliable: Boolean = false,
                           checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "personalizedPageRank needs at least one iteration")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    val sd = seeds.select(col("id").cast("long").as("id")).distinct()
    val n = nodes.select(col("id").cast("long").as("id"))
      .join(broadcast(sd.withColumn("__seed", lit(true))), Seq("id"), "left")
      .select(col("id"), coalesce(col("__seed"), lit(false)).as("is_seed"))
      .persist()
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val ew = e.join(outdeg, "src").persist()
    val stats = n.agg(sum(when(col("is_seed"), 1L).otherwise(0L))
      .cast("double").as("n_seeds"))
    val teleport = when(col("is_seed"),
      lit(1.0 - damping) / col("n_seeds")).otherwise(lit(0.0))
    var ranks = n.crossJoin(broadcast(stats))
      .select(col("id"),
        when(col("is_seed"), lit(1.0) / col("n_seeds"))
          .otherwise(lit(0.0)).as("pr"))
    for (i <- 1 to iterations) {
      val contribs = ew.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), col("src"),
          (col("pr") / col("outdeg")).as("contrib"))
      val sums =
        if (exactFold)
          contribs.groupBy(col("dst")).agg(
            aggregate(
              array_sort(collect_list(struct(col("src"), col("contrib").as("c")))),
              lit(0.0), (acc, x) => acc + x.getField("c")).as("s"))
        else
          contribs.groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
      ranks = n.join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(stats))
        .select(col("id"),
          (teleport
            + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = if (reliable) ranks.checkpoint() else ranks.localCheckpoint()
    }
    // same release discipline as [[pageRank]]: eager final checkpoint,
    // then drop the persisted node-flag and edge frames
    val out = if (reliable) ranks.checkpoint() else ranks.localCheckpoint()
    n.unpersist(blocking = false)
    ew.unpersist(blocking = false)
    out
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with a
    * deterministic tie-break — community detection over crawl/link
    * graphs (domain clustering, near-dup cluster refinement beyond
    * connected components).
    *
    * Every node starts labeled with its own id. Per iteration, each
    * node adopts the most frequent label among its neighbors, ties
    * broken by SMALLEST label; nodes with no neighbors keep their
    * current label. Synchronous (all updates from the previous round's
    * labels) + min-label ties = fully deterministic, unlike the
    * textbook's random asynchronous order — the property that makes it
    * oracle-checkable and re-runnable.
    *
    * Plan shape per iteration: one join of label rows onto the
    * persisted (symmetrized, deduplicated, self-loop-free) edge list,
    * then TWO partial aggregations — count per (node, label), then
    * `max(struct(count, -label))` per node, which encodes the
    * most-frequent/min-label rule as a single associative max so no
    * window or second shuffle of raw neighbor rows is needed. Only
    * label rows (|V|) shuffle per iteration. The label frame is
    * consumed TWICE per iteration (neighbor join + the isolated-node
    * left join), so each round's labels are EAGERLY checkpointed
    * (localCheckpoint single-JVM, reliable on a cluster) — computed
    * once, plan truncated to a leaf (the double-reference would
    * otherwise double the analyzed tree per round), superseded storage
    * reclaimed by the ContextCleaner. The same Pregel
    * materialize-per-superstep shape as [[hits]].
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
                       iterations: Int = 3, undirected: Boolean = true,
                       reliable: Boolean = false): DataFrame = {
    require(iterations >= 1, "labelPropagation needs at least one iteration")
    val n = nodes.select(col("id").cast("long").as("id"))
    val raw = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val sym = if (undirected)
      raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
    else raw
    val e = sym.filter(col("src") =!= col("dst")).distinct().persist()
    var labels = n.select(col("id"), col("id").as("lab"))
    for (_ <- 1 to iterations) {
      val neigh = e.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab"))
      val best = neigh.groupBy(col("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("new_lab"))
      val next = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lab"), col("lab")).as("lab"))
      labels = if (reliable) next.checkpoint() else next.localCheckpoint()
    }
    // labels is a checkpointed leaf — the edge cache is releasable
    e.unpersist(blocking = false)
    labels.select(col("id"), col("lab").as("label"))
  }
}
