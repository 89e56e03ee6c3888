package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** sf1.0 scaling-corpus generator (VERDICT r8 Next #1): replicate the
  * driver's sf0.1 tables ×`copies` under `target/testdata/sf1.0` so the
  * full query set can be measured one decade up from the bench scale.
  * /root/testdata is read-only and the driver only ships sf ≤ 0.1, so
  * the decade corpus is derived, never checked in, and never used for
  * correctness — ONLY for t(sf1)/t(sf0.1) scaling ratios (SCALING.md).
  *
  * Replication is key-shifted and distribution-preserving — naive ×10
  * duplication would hand every pair-forming dedup query a corpus where
  * EVERY doc has 9 exact clones, turning the scaling measurement into a
  * measurement of an artificial dup-density cliff:
  *  - region/nation: fixed dimensions, copied once (TPC-H convention).
  *  - customer/supplier/part/orders/lineitem/events: copy c shifts each
  *    key by c × (maxKey+1) of its table, so FK joins land exactly as
  *    at sf0.1 and per-key fan-ins (orders per customer, events per
  *    user) stay constant — the corpus grows in ENTITIES, not in skew.
  *    Timestamps are left alone: windows get ×10 denser, which is what
  *    a bigger deployment's event stream does.
  *  - documents: copy c > 0 word-shuffles each text with a seed from
  *    (copy, xxh64(text)) — Fisher-Yates over single-space tokens, so
  *    length, token multiset, stopword/punct ratios and lang markers
  *    survive (quality/langid selectivities hold), identical texts stay
  *    identical WITHIN a copy (exact-dup structure scales ×10), but
  *    char-gram contiguity across copies is destroyed (no cross-copy
  *    near-dup clones). Span/paragraph overlaps between *different*
  *    docs only survive in copy 0 — q47/q57-style match densities
  *    scale ~×1 while their scan volume scales ×10; noted in
  *    SCALING.md.
  *  - embeddings: copy c > 0 applies a per-copy SIGNED PERMUTATION of
  *    the 64 dims (an orthogonal transform): norms and all within-copy
  *    dot products are preserved bit-for-bit in structure (cosine
  *    near-dup clusters, kNN topology scale ×10 faithfully) while
  *    cross-copy cosines collapse to noise.
  *
  * Run: sbt "runMain graft.tools.ScaleGen [copies] [outDir]".
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val out = args.lift(1).getOrElse("target/testdata/sf1.0")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    import spark.implicits._

    def load(name: String): DataFrame = graft.Tables.load(spark, src, name)
    def save(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] wrote $name")
    }

    // fixed dimensions: one copy
    save("region", load("region"))
    save("nation", load("nation"))

    // key-shifted fact/dim replication: copy c adds c*(max+1) to every
    // key column listed, preserving all FK joins within the copy
    def shifted(name: String, keys: Seq[String]): DataFrame = {
      val base = load(name).cache()
      val stride: Map[String, Long] = keys.map { k =>
        k -> (base.agg(max(col(k)).cast("long")).head.getLong(0) + 1L)
      }.toMap
      (0 until copies).map { c =>
        keys.foldLeft(base) { (df, k) =>
          df.withColumn(k, (col(k).cast("long") + lit(c * stride(k))).as(k))
        }
      }.reduce(_ unionAll _)
    }
    save("customer", shifted("customer", Seq("c_custkey")))
    save("supplier", shifted("supplier", Seq("s_suppkey")))
    save("part", shifted("part", Seq("p_partkey")))
    save("orders", shifted("orders", Seq("o_orderkey", "o_custkey")))
    save("lineitem", shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")))
    save("events", shifted("events", Seq("event_id", "user_id")))

    // documents: key shift + per-copy seeded word shuffle (copy 0 verbatim)
    val docs = load("documents").as[(Long, String, String, String, Long)].cache()
    val nDocs = docs.agg(max(col("doc_id")).cast("long")).head.getLong(0) + 1L
    val docScaled = (0 until copies).map { c =>
      docs.mapPartitions { it =>
        it.map { case (id, text, lang, source, n) =>
          val t = if (c == 0 || text == null) text else shuffleWords(text, c.toLong)
          (id + c * nDocs, t, lang, source, n)
        }
      }
    }.reduce(_ unionAll _).toDF("doc_id", "text", "lang", "source", "n_chars")
    save("documents", docScaled)

    // embeddings: key shift + per-copy signed permutation of dims
    val emb = load("embeddings").as[(Long, Array[Float], Int)].cache()
    val nVec = emb.agg(max(col("vec_id")).cast("long")).head.getLong(0) + 1L
    val dim = emb.head._2.length
    val embScaled = (0 until copies).map { c =>
      val (perm, sign) = signedPerm(dim, c)
      emb.mapPartitions { it =>
        it.map { case (id, v, label) =>
          val w =
            if (c == 0) v
            else {
              val o = new Array[Float](v.length)
              var i = 0
              while (i < v.length) { o(i) = v(perm(i)) * sign(i); i += 1 }
              o
            }
          (id + c * nVec, w, label)
        }
      }
    }.reduce(_ unionAll _).toDF("vec_id", "embedding", "label")
    save("embeddings", embScaled)

    spark.stop()
  }

  /** Fisher-Yates over single-space-split tokens, seeded by the copy
    * index and the text's own xxh64 — identical texts shuffle
    * identically within a copy (dup structure preserved), differently
    * across copies (clone structure broken). split/mkString with
    * limit -1 keeps empty tokens, so total length is exact. */
  private[tools] def shuffleWords(text: String, copy: Long): String = {
    val words = text.split(" ", -1)
    if (words.length < 2) return text
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    val rnd = new java.util.Random(h ^ (copy * 0x9e3779b97f4a7c15L))
    var i = words.length - 1
    while (i > 0) {
      val j = rnd.nextInt(i + 1)
      val tmp = words(i); words(i) = words(j); words(j) = tmp
      i -= 1
    }
    words.mkString(" ")
  }

  /** Per-copy signed permutation (orthogonal transform) of `dim` axes. */
  private[tools] def signedPerm(dim: Int, copy: Int): (Array[Int], Array[Float]) = {
    val rnd = new java.util.Random(777L + copy)
    val perm = (0 until dim).toArray
    var i = dim - 1
    while (i > 0) {
      val j = rnd.nextInt(i + 1)
      val tmp = perm(i); perm(i) = perm(j); perm(j) = tmp
      i -= 1
    }
    val sign = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    (perm, sign)
  }
}
