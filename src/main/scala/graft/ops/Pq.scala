package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (PQ) ANN (r15, beyond-parity — the memory-side
  * complement to [[Ivf]]'s coarse quantizer; Jégou, Douze & Schmid
  * 2011, "Product Quantization for Nearest Neighbor Search", IEEE
  * TPAMI 33(1)): split each D-dim vector into `m` subvectors, k-means
  * each subspace independently, and store per vector only the m
  * nearest-centroid CODES — 4 bytes here versus 512 for the raw
  * doubles. Search is ADC (asymmetric distance computation): per query
  * build the m × k table of exact subspace distances ONCE, then score
  * every corpus vector with m table lookups + (m−1) additions, never
  * touching the original vectors.
  *
  * Why this matters at 100 TB: IVF decides WHICH cells to scan; PQ
  * decides what scanning COSTS — the codes table for 10⁹ × 64-dim
  * vectors is ~4 GB (fits one executor's memory) versus ~512 GB raw,
  * and the scan stage does integer lookups instead of 64-dim float
  * math. Training reuses [[Ivf.train]]'s deterministic distributed
  * Lloyd per subspace (driver holds only m·k·subDim doubles); encoding
  * is one narrow map pass (codebooks ride the closure); ADC scoring is
  * one scan + the standard map-side-top-k window — no shuffle carries
  * anything vector-sized.
  *
  * Determinism/oracle: codes are INTEGERS (nearest-centroid argmin
  * with lowest-index tie-break, exactly [[Ivf.Model.nearestCell]]);
  * the emitted ADC ordering ties break by id, and the only float
  * arithmetic is fixed-order (subspace 0..m−1 left-to-right adds), so
  * a relational oracle reading the persisted codebooks reproduces
  * codes and ranking exactly. */
object Pq {

  final case class Codebooks(subDim: Int, books: Vector[Ivf.Model])
      extends Serializable {
    def m: Int = books.length
    /** the m codes of one vector (lowest-index tie-break per subspace) */
    def encodeVec(v: Seq[Double]): Array[Int] = {
      val out = new Array[Int](books.length)
      var s = 0
      while (s < books.length) {
        out(s) = books(s).nearestCell(v.slice(s * subDim, (s + 1) * subDim))
        s += 1
      }
      out
    }
  }

  /** Train m per-subspace codebooks of k centroids each over the
    * corpus — m independent [[Ivf.train]] runs on sliced projections
    * (each is the deterministic distributed Lloyd; the k×P partial
    * matrix never reaches the driver). D must divide evenly. */
  def train(corpus: DataFrame, m: Int = 4, k: Int = 16, iters: Int = 3,
            idCol: String = "vec_id", embCol: String = "embedding"): Codebooks = {
    val dim = corpus.select(size(col(embCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { s =>
      Ivf.train(
        corpus.select(col(idCol),
          slice(col(embCol), s * subDim + 1, subDim).as(embCol)),
        k, iters, idCol, embCol)
    }.toVector
    Codebooks(subDim, books)
  }

  /** Codebooks as (sub INT, cell INT, centroid ARRAY<DOUBLE>) — persist
    * next to query output so an external oracle re-derives codes and
    * ADC ranking from the exact same model (the [[Ivf.centroidsDF]]
    * contract, one level up). */
  def codebooksDF(spark: SparkSession, cb: Codebooks): DataFrame = {
    import spark.implicits._
    (for {
      (book, s) <- cb.books.zipWithIndex
      (cen, c) <- book.centroids.zipWithIndex
    } yield (s, c, cen.toSeq)).toDF("sub", "cell", "centroid")
  }

  /** Corpus → (id, m int codes): ONE narrow map pass, codebooks in the
    * closure (m·k·subDim doubles — KBs). */
  def encode(corpus: DataFrame, cb: Codebooks,
             idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long"), col(embCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, cb.encodeVec(v).toSeq) }
      .toDF(idCol, "codes")
  }

  /** ADC top-k: per query (a SMALL fixture set — collected; the ADC
    * tables ARE what real systems broadcast), build the m×k exact
    * subspace-distance table, score every encoded corpus vector with
    * m lookups + fixed-order adds, keep the top `topK` by (adc, id).
    * Output: (query_id, rank, neighbor_id, c0..c{m−1}) — the neighbor
    * CODES ride along as integer witnesses of the encoding. */
  def searchAdc(corpus: DataFrame, queries: DataFrame, cb: Codebooks,
                topK: Int = 10, idCol: String = "vec_id",
                embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val qs: Array[(Long, Array[Array[Double]])] = queries
      .select(col(idCol).cast("long"), col(embCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .collect()
      .map { case (qid, qv) =>
        val tables = Array.tabulate(cb.m) { s =>
          val sub = qv.slice(s * cb.subDim, (s + 1) * cb.subDim)
          cb.books(s).centroids.map { cen =>
            var d = 0.0
            var i = 0
            while (i < cen.length) { val x = sub(i) - cen(i); d += x * x; i += 1 }
            d
          }
        }
        (qid, tables)
      }
    val bc = spark.sparkContext.broadcast(qs)
    val scored = encode(corpus, cb, idCol, embCol)
      .as[(Long, Seq[Int])]
      .mapPartitions { rows =>
        val queries = bc.value
        rows.flatMap { case (id, codes) =>
          queries.iterator.filter(_._1 != id).map { case (qid, t) =>
            var adc = 0.0
            var s = 0
            while (s < codes.length) { adc += t(s)(codes(s)); s += 1 }
            (qid, id, adc, codes)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "adc", "codes")
    // map-side top-k: rank ≤ topK compiles to WindowGroupLimit, so each
    // task keeps only its local top rows before the single exchange
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(Seq(col("query_id"), col("rank"), col("neighbor_id")) ++
        (0 until cb.m).map(s => col("codes").getItem(s).cast("int").as(s"c$s")): _*)
  }
}
