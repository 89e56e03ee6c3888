package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Pq

/** q163: PRODUCT-QUANTIZATION ANN under the hard signal (r15,
  * beyond-parity — see [[graft.ops.Pq]]): train 4×16 codebooks over
  * the embeddings (the deterministic distributed Lloyd per subspace),
  * persist them for the oracle (the q18 centroids contract), encode
  * the corpus to 4 integer codes per vector, and ADC-rank the top 10
  * neighbors of the first five vectors. The emitted rows carry each
  * neighbor's CODES as integer witnesses, so the oracle pins the
  * whole encode step, not just the final ordering.
  *
  * Float-exactness discipline: the oracle SQL spells every subspace
  * distance as the explicit 16-term left-associated sum of squares —
  * the exact association [[graft.ops.Ivf.Model.nearestCell]] and the
  * ADC table builder compute — and the 4-table ADC sum as the
  * explicit t0+t1+t2+t3 chain, so both engines run identical IEEE
  * operation sequences (no reliance on an aggregate's unspecified
  * fold order). Ties (identical codes ⇒ bit-identical ADC) break by
  * neighbor id on both sides. */
object PqQuery {

  /** pid-scoped like SparkEntry.ivfCentroidsPath, same hygiene — and
    * sf-scoped (ADVICE r15): the write election is keyed per sfDir, so
    * a single process verifying several scale factors must not let the
    * later sf overwrite the earlier sf's persisted oracle input. */
  private[graft] def codebooksPath(sfDir: String) =
    s"/root/repo/target/verify-oracle/pq_codebooks-${ProcessHandle.current().pid()}" +
      s"-${java.nio.file.Paths.get(sfDir).getFileName}"

  /** The sf dir whose codebooks the NEXT oracle dump should read —
    * set on every run(); Verify's contract (dump follows the runs)
    * makes this the right path for the compare that follows. */
  @volatile private var lastSfDir: String = ""

  private val writes =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[Void]]()

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    lastSfDir = sfDir
    val e = Tables.load(spark, sfDir, "embeddings")
    val cb = Pq.train(e, m = 4, k = 16, iters = 3)
    // one writer, everyone waits (the q18 election — two concurrent
    // overwrite jobs would share the _temporary staging dir)
    val fut = new java.util.concurrent.CompletableFuture[Void]()
    val prior = writes.putIfAbsent(sfDir, fut)
    if (prior == null) {
      try {
        graft.core.Fs.reapStalePidDirs(
          java.nio.file.Paths.get(codebooksPath(sfDir)).getParent, "pq_codebooks-")
        Pq.codebooksDF(spark, cb).coalesce(1)
          .write.mode("overwrite").parquet(codebooksPath(sfDir))
        fut.complete(null)
      } catch {
        case t: Throwable =>
          writes.remove(sfDir, fut)
          fut.completeExceptionally(t)
          throw t
      }
    } else prior.join()
    Pq.searchAdc(e, e.filter(col("vec_id") < 5), cb, topK = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** the explicit left-associated 16-term sum of squares between a
    * vector expression (1-based, offset by `sub`·16) and b.cen */
  private def dsq(vec: String): String =
    (1 to 16).map { i =>
      val x = s"($vec[CAST(b.sub * 16 + $i AS INT)] - b.cen[$i])"
      s"($x * $x)"
    }.mkString(" + ")

  def oracleSql: String =
    s"""WITH books AS (
       |  SELECT sub, cell, CAST(centroid AS DOUBLE[]) AS cen
       |  FROM read_parquet('${codebooksPath(lastSfDir)}/*.parquet')),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cd AS ( -- nearest cell per (vector, subspace), lowest-cell ties
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT e.vec_id, b.sub, b.cell,
       |      row_number() OVER (PARTITION BY e.vec_id, b.sub
       |        ORDER BY ${dsq("e.emb")} ASC, b.cell ASC) AS rn
       |    FROM e CROSS JOIN books b) WHERE rn = 1),
       |cw AS ( -- codes pivoted wide
       |  SELECT vec_id,
       |    max(CASE WHEN sub = 0 THEN cell END) AS c0,
       |    max(CASE WHEN sub = 1 THEN cell END) AS c1,
       |    max(CASE WHEN sub = 2 THEN cell END) AS c2,
       |    max(CASE WHEN sub = 3 THEN cell END) AS c3
       |  FROM cd GROUP BY vec_id),
       |qt AS ( -- per-query subspace distance tables
       |  SELECT q.vec_id AS query_id, b.sub, b.cell, ${dsq("q.emb")} AS d
       |  FROM (SELECT vec_id, emb FROM e WHERE vec_id < 5) q
       |  CROSS JOIN books b),
       |scored AS (
       |  SELECT t0.query_id, v.vec_id,
       |    t0.d + t1.d + t2.d + t3.d AS adc, v.c0, v.c1, v.c2, v.c3
       |  FROM cw v
       |  JOIN qt t0 ON t0.sub = 0 AND t0.cell = v.c0
       |  JOIN qt t1 ON t1.sub = 1 AND t1.cell = v.c1 AND t1.query_id = t0.query_id
       |  JOIN qt t2 ON t2.sub = 2 AND t2.cell = v.c2 AND t2.query_id = t0.query_id
       |  JOIN qt t3 ON t3.sub = 3 AND t3.cell = v.c3 AND t3.query_id = t0.query_id
       |  WHERE v.vec_id <> t0.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, c0, c1, c2, c3,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS rn
       |  FROM scored)
       |SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  CAST(c0 AS INT) AS c0, CAST(c1 AS INT) AS c1,
       |  CAST(c2 AS INT) AS c2, CAST(c3 AS INT) AS c3
       |FROM ranked WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin
}
