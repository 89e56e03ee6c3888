package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Driver-verified multimodal queries. */
object MultimodalQueries {

  /** REAL PCM audio decode under the hard signal: a deterministic
    * 16-bit mono WAV per document (samples are pure integer arithmetic
    * of (doc_id, i) — no transcendentals, so any engine reproduces them
    * bit-for-bit), encoded with `javax.sound.sampled.AudioSystem.write`
    * executor-side, decoded back through the production
    * [[Multimodal.audioFeatures]] path (JavaSoundDecoder), RMS loudness
    * per 100-sample window exploded to scalar rows.
    *
    * Why the hash can be exact for a FLOAT aggregate: every sample is
    * x/32768 with integer x in [-32768, 32767], so each square is an
    * integer over 2^30 and every partial sum of 100 of them stays well
    * under 2^53 — double addition is EXACT here in any order. The final
    * sqrt/divide/float-cast are single correctly-rounded IEEE ops both
    * engines share. The oracle re-derives the same samples relationally
    * (generate_series + the same modular formula).
    *
    * 100 TB shape: generation and decode are one mapPartitions pass
    * (decoder init once per partition), the explode is executor-side,
    * and the only exchange is the final presentation sort. */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = 800 // 8 windows × 100 samples at 8 kHz = 0.1 s per clip
    val wavs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
          val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            8000f, 16, 1, 2, 8000f, false)
          val in = new AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, n.toLong)
          val buf = new java.io.ByteArrayOutputStream()
          AudioSystem.write(in, AudioFileFormat.Type.WAVE, buf)
          (id, buf.toByteArray, "audio/wav")
        }
      }.toDF("id", "media", "mime")
    Multimodal.audioFeatures(wavs) // real javax.sound decode
      .select(col("id").as("doc_id"),
        posexplode(col("loudness")).as(Seq("window_idx", "rms")))
      .select(col("doc_id"), col("window_idx").cast("long").as("window_idx"),
        col("rms"))
      .orderBy(col("doc_id"), col("window_idx"))
  }

  /** REAL image decode under the hard signal, same construction as
    * [[audioDecode]]: a deterministic 32×16 RGB PNG per document (pixel
    * channels are integer arithmetic of (doc_id, x, y)), encoded with
    * `javax.imageio` executor-side, decoded back through the production
    * [[Multimodal.imageFeatures]] path (ImageIODecoder), the 4×2
    * luminance-grid fingerprint exploded to scalar rows.
    *
    * Exactness: PNG is lossless, the fingerprint accumulates integer
    * channel sums per 8×8 cell (order-independent), and the single
    * sum/(64·765) divide + float cast are correctly-rounded ops the
    * oracle replicates verbatim. width/height prove the decode read the
    * real bitmap. */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (w, h) = (32, 16) // 4×2 grid of exact 8×8 cells
    // every 4th doc: the PNG encode/decode fixture dominates the query's
    // cost and a quarter of the corpus carries the same per-pixel decode
    // signal (the subsample is in the oracle too — nothing silent)
    val pngs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .filter(col("doc_id") % 4 === 0)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
              val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
              val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          (id, buf.toByteArray, "image/png")
        }
      }.toDF("id", "media", "mime")
    Multimodal.imageFeatures(pngs, decoder = new Multimodal.ImageIODecoder)
      .select(col("id").as("doc_id"), col("width"), col("height"),
        posexplode(col("features")).as(Seq("cell", "lum")))
      .select(col("doc_id"), col("width"), col("height"),
        col("cell").cast("long").as("cell"), col("lum"))
      .orderBy(col("doc_id"), col("cell"))
  }
}
