package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Convention: media travels as an opaque BINARY column plus typed
  * metadata (`mime`, and whatever the pipeline extracts). All transforms
  * here are `mapPartitions`-shaped: ONE decoder instance per partition
  * (real media libraries have expensive init — codecs, model weights),
  * rows streamed through it. That is the exact batch shape a real
  * decoder plugs into.
  *
  * STUB NOTICE: this container has no image/audio libraries, so
  * `StubDecoder` derives deterministic fake pixels/frames from the byte
  * content (sizes, hashes). Swap `Decoder` implementations to go real —
  * every schema, partition and batch contract stays identical.
  */
object Multimodal {

  /** Decoded-image surrogate: dimensions + a tiny deterministic
    * signature standing in for pixel data. */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
                                signature: Array[Float])

  /** The pluggable decode boundary. Implementations must be
    * Serializable (constructed per partition on executors). */
  trait Decoder extends Serializable {
    def init(): Unit
    def decodeImage(bytes: Array[Byte], mime: String): DecodedImage
    def frames(bytes: Array[Byte], mime: String, everyNth: Int): Iterator[Array[Byte]]
    def resize(bytes: Array[Byte], mime: String, w: Int, h: Int): Array[Byte]
  }

  /** Deterministic fake decoder — STUB for the absent media libraries.
    * Dimensions and signatures are pure functions of the bytes, so specs
    * can pin behavior and swap-in of a real decoder changes nothing
    * structurally. */
  final class StubDecoder extends Decoder {
    def init(): Unit = StubDecoder.inits.incrementAndGet()
    private def h32(bytes: Array[Byte], seed: Int): Int =
      scala.util.hashing.MurmurHash3.bytesHash(bytes, seed)
    def decodeImage(bytes: Array[Byte], mime: String): DecodedImage = {
      val w = 64 + math.abs(h32(bytes, 1)) % 1024
      val h = 64 + math.abs(h32(bytes, 2)) % 1024
      val sig = Array.tabulate(8)(i => (h32(bytes, 10 + i) / Int.MaxValue.toFloat))
      DecodedImage(w, h, 3, sig)
    }
    def frames(bytes: Array[Byte], mime: String, everyNth: Int): Iterator[Array[Byte]] = {
      val n = 1 + math.abs(h32(bytes, 3)) % 30 // fake frame count
      (0 until n by everyNth).iterator.map { i =>
        val b = bytes.take(16).clone(); if (b.nonEmpty) b(0) = (b(0) ^ i).toByte; b
      }
    }
    def resize(bytes: Array[Byte], mime: String, w: Int, h: Int): Array[Byte] =
      (s"resized:${w}x$h:" + h32(bytes, 4)).getBytes
  }
  object StubDecoder {
    /** per-partition init counter, observable from local-mode specs */
    val inits = new AtomicInteger(0)
  }

  /** Image feature extraction: (id, media, mime) → (id, width, height,
    * channels, features ARRAY<FLOAT>). One decoder per partition, rows
    * streamed — the 1000-executor batch shape. */
  def imageFeatures(df: DataFrame, idCol: String = "id",
                    bytesCol: String = "media", mimeCol: String = "mime",
                    decoder: Decoder = new StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol), col(mimeCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        decoder.init() // once per partition, like loading a codec/model
        rows.map { case (id, bytes, mime) =>
          val d = decoder.decodeImage(bytes, mime)
          (id, d.width, d.height, d.channels, d.signature.toSeq)
        }
      }
      .toDF(idCol, "width", "height", "channels", "features")
  }

  /** Video frame sampling: 1 row → N frame rows (id, frame_idx, frame).
    * flatMap shape — the explode happens executor-side, never collecting
    * a whole video's frames into one row. */
  def frameSample(df: DataFrame, everyNth: Int, idCol: String = "id",
                  bytesCol: String = "media", mimeCol: String = "mime",
                  decoder: Decoder = new StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol), col(mimeCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        decoder.init()
        rows.flatMap { case (id, bytes, mime) =>
          decoder.frames(bytes, mime, everyNth).zipWithIndex.map {
            case (frame, i) => (id, (i * everyNth).toLong, frame)
          }
        }
      }
      .toDF(idCol, "frame_idx", "frame")
  }

  /** Image resize: bytes → bytes with target dims recorded as metadata
    * columns (schema contract for downstream training loaders). */
  def resizeImages(df: DataFrame, w: Int, h: Int, idCol: String = "id",
                   bytesCol: String = "media", mimeCol: String = "mime",
                   decoder: Decoder = new StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol), col(mimeCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        decoder.init()
        rows.map { case (id, bytes, mime) =>
          (id, decoder.resize(bytes, mime, w, h), mime, w, h)
        }
      }
      .toDF(idCol, bytesCol, mimeCol, "target_w", "target_h")
  }

  /** Size-aware repartitioning for blob tables: media rows vary from KBs
    * to GBs, so row-count partitioning skews badly. Scans byte lengths
    * once (column-pruned — only the length is read when the source
    * supports it) and repartitions to ~targetBytes per partition. */
  def balanceBySize(df: DataFrame, targetBytes: Long,
                    bytesCol: String = "media"): DataFrame = {
    val total = df.select(sum(length(col(bytesCol)).cast("long")))
      .collect()(0).getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    df.repartition(parts)
  }
}
