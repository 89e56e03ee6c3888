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
    ranks
  }
}
