package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN — the coarse-quantizer scale path the brief
  * names alongside LSH: k-means cells over the corpus, each vector
  * assigned to its nearest centroid; a query scores only the `nprobe`
  * nearest cells' members instead of the whole corpus.
  *
  * Scale design: training is mini-batch-free Lloyd iterations where each
  * partition emits (cell, pid, partialSum, count); the partials COMBINE
  * IN A SHUFFLE keyed by cell (k reducers, each folding its own P
  * partition-partials in pid order), so the driver receives exactly k
  * mean rows per iteration — never the k × P partial matrix. That keeps
  * the driver envelope O(k·dim) and makes coarse quantizers at real
  * sizes (k = 65536 cells × 64-dim ≈ 32 MB of centroids) trainable:
  * the k×P intermediate (65536 × thousands of partitions) only ever
  * exists sharded across reducers. The broadcast of the centroid model
  * to executors is the same O(k·dim) and is the true upper bound on k
  * for this IVF shape (as it is for MLlib KMeans). Assignment and
  * search are ordinary shuffles keyed by cell id. Determinism:
  * centroids seed from fixed corpus rows, iterations are a fixed count,
  * and every floating-point fold has a fixed order (row order within a
  * partition, pid order across partitions).
  */
object Ivf {

  /** k ≈ √corpusSize — the standard IVF coarse-quantizer sizing (FAISS
    * guideline): cells then hold ~√n vectors each, and a query at
    * `nprobe` cells scores ~nprobe·√n candidates. Clamped to
    * [16, 1 << 20]; the true upper bound on k for this shape is the
    * O(k·dim) centroid broadcast (see the object scaladoc). The sf0.1
    * default k in SparkEntry (16) matches √(6k) ≈ 78 loosely downward
    * because the oracle re-derives cells relationally — at 10^9
    * vectors use k ≈ 32768, nprobe 8-64. */
  def recommendedK(corpusSize: Long): Int = {
    require(corpusSize > 0)
    math.min(1 << 20, math.max(16, math.round(math.sqrt(corpusSize.toDouble)).toInt))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Soft sizing guard, same discipline as [[Ann.warnIfUnderBucketed]]:
    * warn (never fail, never count) when cells would hold ≫ the ~√n
    * occupancy the IVF shape intends — the search stage's per-cell scan
    * cost is corpus/k, so a k two orders below √n is a silent 100×
    * search slowdown, not an error Spark would surface. */
  def warnIfUnderProvisioned(corpusSize: Long, k: Int): Option[String] = {
    val perCell = corpusSize.toDouble / math.max(1, k)
    val rec = recommendedK(corpusSize)
    if (perCell > 64.0 * rec) {
      val msg = s"Ivf: ~${perCell.toLong} vectors per cell (corpus " +
        s"$corpusSize, k=$k) — searches scan cells far larger than the " +
        s"~√n the IVF shape intends. Raise k to ~$rec (rule: k ≈ √corpus)."
      log.warn(msg)
      Some(msg)
    } else None
  }

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    def nearestCell(v: Seq[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        var d = 0.0; var i = 0
        val cen = centroids(c)
        while (i < cen.length && i < v.length) {
          val x = v(i) - cen(i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    def nearestCells(v: Seq[Double], n: Int): Seq[Int] =
      centroids.indices.map { c =>
        var d = 0.0; var i = 0
        val cen = centroids(c)
        while (i < cen.length && i < v.length) {
          val x = v(i) - cen(i); d += x * x; i += 1
        }
        (c, d)
      }.sortBy(_._2).take(n).map(_._1)
  }

  /** Deterministic Lloyd k-means: seeds = first k vectors by id order;
    * fixed iteration count. Per-partition partial sums combine in a
    * groupByKey(cell) shuffle — k reducer rows reach the driver, never
    * k × partitions (see the object scaladoc for the scale envelope).
    * The fold is bit-deterministic: rows accumulate in partition order,
    * partials accumulate in explicit partition-id order — the exact sum
    * order a driver-side combine over `collect()` (partition-ordered)
    * would produce, so centroids are reproducible run to run and
    * mode-independent.
    *
    * Size `k` with the corpus: k ≈ √n ([[recommendedK]]); callers that
    * already know n should run [[warnIfUnderProvisioned]] — an
    * under-provisioned k trains fine and then silently scans giant
    * cells at search time. */
  def train(corpus: DataFrame, k: Int, iters: Int = 5,
            idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // persist for the training loop: the seed collect + every k-means
    // iteration re-scan this projection (iters+1 consumers); train()
    // is eager (ends in collects), so the unpersist point is exact
    val vecs: Dataset[(Long, Seq[Double])] = corpus
      .select(col(idCol).cast("long"), col(embCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    var centroids = vecs.orderBy(col(idCol)).limit(k).collect()
      .map(_._2.toArray)
    (0 until iters).foreach { _ =>
      val model = Model(centroids)
      val partials = vecs.mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val sums = scala.collection.mutable.Map[Int, (Array[Double], Long)]()
        rows.foreach { case (_, v) =>
          val c = model.nearestCell(v)
          val (s, n) = sums.getOrElseUpdate(c, (new Array[Double](v.length), 0L))
          var i = 0
          while (i < v.length) { s(i) += v(i); i += 1 }
          sums(c) = (s, n + 1)
        }
        sums.iterator.map { case (c, (s, n)) => (c, pid, s.toSeq, n) }
      }
      // distributed combine: each cell's reducer folds its ≤P partials
      // in pid order (deterministic), emits one mean row
      val combined = partials.groupByKey(_._1)
        .mapGroups { (c, it) =>
          val parts = it.toArray.sortBy(_._2)
          val dim = parts.head._3.length
          val s = new Array[Double](dim)
          var n = 0L
          parts.foreach { case (_, _, ps, pn) =>
            var i = 0
            while (i < dim) { s(i) += ps(i); i += 1 }
            n += pn
          }
          (c, (s.map(_ / n): Seq[Double]))
        }
        .collect().toMap
      centroids = centroids.indices
        .map(c => combined.get(c).map(_.toArray).getOrElse(centroids(c))).toArray
    }
    Model(centroids)
    } finally vecs.unpersist(blocking = false)
  }

  /** Trained centroids as a (cell INT, centroid ARRAY<DOUBLE>) frame —
    * callers persist this next to query output so an external oracle can
    * re-derive nearest-cell assignment and nprobe search relationally
    * from the exact same model. */
  def centroidsDF(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
  }

  /** (id, cell) assignment for the corpus — the inverted file. */
  def assign(corpus: DataFrame, model: Model,
             idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long"), col(embCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, model.nearestCell(v)) }
      .toDF(idCol, "cell")
  }

  /** Approximate top-k by cosine: queries probe their `nprobe` nearest
    * cells, exact scoring within. Returns (query_id, rank, neighbor_id,
    * score). */
  def search(corpus: DataFrame, queries: DataFrame, model: Model, k: Int,
             nprobe: Int, idCol: String = "vec_id",
             embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val e = corpus.select(col(idCol), col(embCol).cast("array<double>").as("emb"))
      .join(assign(corpus, model, idCol, embCol), idCol)
    val q = queries.select(col(idCol).cast("long"), col(embCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, v) =>
        model.nearestCells(v, nprobe).map(c => (id, c, v))
      }
      .toDF("query_id", "cell", "qemb")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol))
    e.join(q, Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("score", Ann.cosine(col("emb"), col("qemb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"), col("score"))
  }
}
