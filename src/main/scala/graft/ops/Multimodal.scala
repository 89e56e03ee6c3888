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
  * Decoders: `ImageIODecoder` is REAL image decode — `javax.imageio`
  * (java.desktop module, present in this JDK) handles PNG/JPEG/BMP/GIF
  * including animated-GIF frame extraction. `JavaSoundDecoder` is REAL
  * PCM audio decode — `javax.sound.sampled` (same java.desktop module)
  * reads WAV/AU/AIFF natively: sample rate, channels, duration, and an
  * RMS-per-window loudness fingerprint; MJPEG video frames decode for
  * real through the keyframe planner + ImageIO ([[mjpegKeyframeHashes]]
  * — every MJPEG sample is a baseline JPEG). `StubDecoder`/
  * `StubAudioDecoder` remain for the genuinely absent codecs only
  * (inter-frame video — H.264/VP9; COMPRESSED audio — MP3/AAC have no
  * JDK service provider): they derive deterministic
  * fake output from the byte content so pipelines and specs can pin the
  * plumbing. Swap implementations to go real — every schema, partition
  * and batch contract stays identical.
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

    /** 64-bit perceptual AVERAGE HASH (aHash) as (hi32, lo32) BIGINT
      * halves: an 8×8 grid of integer luminance-sum cells over the
      * decoded pixels, bit i = 1 iff `cellSum_i × 64 > totalSum` (cell
      * mean above global mean, compared in INTEGERS so any engine
      * reproduces every bit exactly). Split halves keep the arithmetic
      * inside non-negative 32-bit range — no 1<<63 sign/overflow
      * divergence between engines. Robust to re-encode; Hamming
      * distance between hashes ranks near-duplicate images. */
    def aHash(bytes: Array[Byte], mime: String): (Long, Long)
  }

  /** Real image decode over `javax.imageio` (PNG/JPEG/BMP/GIF — the
    * formats the JDK's java.desktop module reads natively, no external
    * libraries). The `signature` is a downsampled pixel fingerprint: a
    * 4×2 grid of mean luminances in [0,1], row-major — cheap, stable
    * across re-encodes of the same pixels, and enough for dedup or
    * near-dup bucketing of images. Video/audio mimes are NOT handled
    * here (no codec in the JDK) — route those to a real codec or the
    * stub. */
  final class ImageIODecoder extends Decoder {
    def init(): Unit = {
      // BufferedImage work is headless-safe; make sure AWT agrees
      System.setProperty("java.awt.headless", "true")
      ImageIODecoder.inits.incrementAndGet()
    }

    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image bytes")
      img
    }

    /** 4×2-grid mean-luminance fingerprint, row-major, values in [0,1].
      * Channel sums accumulate as INTEGERS with one final division —
      * faster than a divide per pixel, and exactly reproducible by any
      * engine (the integer sum is order-independent; the single
      * divide + float round are correctly-rounded IEEE ops), which is
      * what lets q37 hash-verify real image decode cross-engine. */
    private def fingerprint(img: java.awt.image.BufferedImage): Array[Float] = {
      val (gw, gh) = (4, 2)
      val out = new Array[Float](gw * gh)
      var cy = 0
      while (cy < gh) {
        var cx = 0
        while (cx < gw) {
          val x0 = img.getWidth * cx / gw; val x1 = math.max(x0 + 1, img.getWidth * (cx + 1) / gw)
          val y0 = img.getHeight * cy / gh; val y1 = math.max(y0 + 1, img.getHeight * (cy + 1) / gh)
          var sum = 0L; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              n += 1; x += 1
            }
            y += 1
          }
          out(cy * gw + cx) = (sum / (n * 765.0)).toFloat
          cx += 1
        }
        cy += 1
      }
      out
    }

    def decodeImage(bytes: Array[Byte], mime: String): DecodedImage = {
      val img = read(bytes)
      DecodedImage(img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents, fingerprint(img))
    }

    /** Frame extraction: animated GIFs yield every `everyNth` frame
      * (ImageReader indexes them natively); single-frame formats yield
      * one frame. Frames re-encode as PNG (lossless, always writable). */
    def frames(bytes: Array[Byte], mime: String, everyNth: Int): Iterator[Array[Byte]] = {
      // materialized eagerly so the reader and its (possibly
      // file-backed) input stream are closed before returning — a lazy
      // iterator would leak one temp file + fd per row until GC
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        require(readers.hasNext, "undecodable image bytes")
        val reader = readers.next()
        try {
          reader.setInput(in)
          val n = reader.getNumImages(true)
          (0 until n by math.max(1, everyNth)).map { i =>
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(reader.read(i), "png", buf)
            buf.toByteArray
          }.iterator
        } finally reader.dispose()
      } finally in.close()
    }

    def resize(bytes: Array[Byte], mime: String, w: Int, h: Int): Array[Byte] = {
      val src = read(bytes)
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", buf)
      buf.toByteArray
    }

    /** Real aHash over decoded pixels. Cell rectangles use the same
      * floor-division grid as [[fingerprint]] (cell (cx,cy) spans
      * [w·cx/8, w·(cx+1)/8) × [h·cy/8, h·(cy+1)/8), min 1 px), sums
      * are (r+g+b) integers, and the bit threshold cross-multiplies:
      * `cellSum · 64 · totalPx > totalSum · cellPx · 64` reduces to
      * comparing MEANS exactly without division — all-integer, so the
      * q85 oracle reproduces every bit from the fixture formula. */
    def aHash(bytes: Array[Byte], mime: String): (Long, Long) = {
      val img = read(bytes)
      val (gw, gh) = (8, 8)
      val sums = new Array[Long](gw * gh)
      val counts = new Array[Long](gw * gh)
      var total = 0L
      var totalPx = 0L
      var cy = 0
      while (cy < gh) {
        var cx = 0
        while (cx < gw) {
          val x0 = img.getWidth * cx / gw
          val x1 = math.max(x0 + 1, img.getWidth * (cx + 1) / gw)
          val y0 = img.getHeight * cy / gh
          val y1 = math.max(y0 + 1, img.getHeight * (cy + 1) / gh)
          var s = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              n += 1; x += 1
            }
            y += 1
          }
          val i = cy * gw + cx
          sums(i) = s; counts(i) = n
          total += s; totalPx += n
          cx += 1
        }
        cy += 1
      }
      var hi = 0L; var lo = 0L
      var i = 0
      while (i < 64) {
        // cell mean > global mean, cross-multiplied to integers
        if (sums(i) * totalPx > total * counts(i)) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      (hi, lo)
    }
  }
  object ImageIODecoder {
    /** per-partition init counter, observable from local-mode specs */
    val inits = new AtomicInteger(0)
  }

  /** Decoded-audio surrogate: stream parameters + a loudness
    * fingerprint (RMS of normalized samples per equal-length window,
    * values in [0,1] — cheap, stable, and enough for silence detection,
    * level bucketing or near-dup grouping of clips). */
  final case class DecodedAudio(sampleRate: Float, channels: Int,
                                frames: Long, durationSec: Double,
                                loudness: Array[Float])

  /** The pluggable audio-decode boundary (constructed per partition). */
  trait AudioDecoder extends Serializable {
    def init(): Unit
    def decodeAudio(bytes: Array[Byte], mime: String): DecodedAudio
  }

  /** Real PCM audio decode over `javax.sound.sampled` (java.desktop
    * module, present in this JDK — the same argument as ImageIO): reads
    * WAV/AU/AIFF natively, converting to signed 16-bit PCM when the
    * container holds another PCM flavor (8-bit unsigned, μ-law/a-law).
    * Compressed formats (MP3/AAC) have no JDK service provider — route
    * those to `StubAudioDecoder` or a real codec library. */
  final class JavaSoundDecoder(windows: Int = 8) extends AudioDecoder {
    def init(): Unit = JavaSoundDecoder.inits.incrementAndGet()

    def decodeAudio(bytes: Array[Byte], mime: String): DecodedAudio = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = raw.getFormat
        val pcm16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val in = if (src.matches(pcm16)) raw
                 else AudioSystem.getAudioInputStream(pcm16, raw)
        val frames = in.getFrameLength
        val data = in.readAllBytes()
        val ch = pcm16.getChannels
        val nSamples = data.length / 2 // 16-bit mono-interleaved samples
        val nFrames = if (frames >= 0) frames else (nSamples / ch).toLong
        // RMS per window over all channels, normalized to [0,1]
        val out = new Array[Float](windows)
        var w = 0
        while (w < windows) {
          val s0 = (nSamples.toLong * w / windows).toInt
          val s1 = (nSamples.toLong * (w + 1) / windows).toInt
          var sum = 0.0; var i = s0
          while (i < s1) {
            // little-endian signed 16-bit
            val v = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort / 32768.0
            sum += v * v; i += 1
          }
          out(w) = if (s1 > s0) math.sqrt(sum / (s1 - s0)).toFloat else 0f
          w += 1
        }
        DecodedAudio(pcm16.getSampleRate, ch, nFrames,
          nFrames.toDouble / pcm16.getSampleRate, out)
      } finally raw.close()
    }
  }
  object JavaSoundDecoder {
    /** per-partition init counter, observable from local-mode specs */
    val inits = new AtomicInteger(0)
  }

  /** Deterministic fake audio decoder — STUB for compressed formats
    * only (MP3/AAC: no service provider in this JDK). PCM containers
    * (WAV/AU/AIFF) decode for real via [[JavaSoundDecoder]]. */
  final class StubAudioDecoder extends AudioDecoder {
    def init(): Unit = StubDecoder.inits.incrementAndGet()
    private def h32(bytes: Array[Byte], seed: Int): Int =
      scala.util.hashing.MurmurHash3.bytesHash(bytes, seed)
    def decodeAudio(bytes: Array[Byte], mime: String): DecodedAudio = {
      val frames = 1000L + math.abs(h32(bytes, 5)) % 100000
      val loud = Array.tabulate(8)(i =>
        math.abs(h32(bytes, 20 + i)).toFloat / Int.MaxValue)
      DecodedAudio(16000f, 1, frames, frames / 16000.0, loud)
    }
  }

  /** Deterministic fake decoder — STUB for the codecs genuinely absent
    * from this JDK (video; compressed audio). Dimensions and signatures
    * are pure functions of the bytes, so specs can pin behavior and
    * swap-in of a real decoder changes nothing structurally. For still
    * images use the real `ImageIODecoder`; for PCM audio the real
    * `JavaSoundDecoder`. */
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
    def aHash(bytes: Array[Byte], mime: String): (Long, Long) =
      // fake but deterministic: two murmur words, masked to the same
      // non-negative 32-bit halves the real hash produces
      (h32(bytes, 5).toLong & 0xffffffffL, h32(bytes, 6).toLong & 0xffffffffL)
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

  /** Perceptual hashes: (id, media, mime) → (id, ahash_hi, ahash_lo) —
    * the [[Decoder.aHash]] 64-bit average hash as two non-negative
    * 32-bit halves. One decoder per partition, rows streamed. Compose
    * with a band join (split each half into 16-bit bands, join on
    * (band, value), Hamming-filter candidates) for image near-dup at
    * corpus scale — the q85 shape. */
  def imageAHashes(df: DataFrame, idCol: String = "id",
                   bytesCol: String = "media", mimeCol: String = "mime",
                   decoder: Decoder = new StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol), col(mimeCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        decoder.init()
        rows.map { case (id, bytes, mime) =>
          val (hi, lo) = decoder.aHash(bytes, mime)
          (id, hi, lo)
        }
      }
      .toDF(idCol, "ahash_hi", "ahash_lo")
  }

  /** Audio feature extraction: (id, media, mime) → (id, sample_rate,
    * channels, frames, duration_sec, loudness ARRAY<FLOAT>). One decoder
    * per partition, rows streamed — same batch shape as images. */
  def audioFeatures(df: DataFrame, idCol: String = "id",
                    bytesCol: String = "media", mimeCol: String = "mime",
                    decoder: AudioDecoder = new JavaSoundDecoder()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol), col(mimeCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        decoder.init()
        rows.map { case (id, bytes, mime) =>
          val a = decoder.decodeAudio(bytes, mime)
          (id, a.sampleRate, a.channels, a.frames, a.durationSec, a.loudness.toSeq)
        }
      }
      .toDF(idCol, "sample_rate", "channels", "frames", "duration_sec", "loudness")
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

  /** Container-header triage: (id, media) → (id, container, brand,
    * duration_ms, n_tracks, width, height) by pure integer parsing of
    * MP4/ISO-BMFF and Matroska/WebM headers ([[ContainerMeta]]) — no
    * codec, no decode. THE first pass of a 100 TB video pipeline: a few
    * hundred header bytes decide what is worth decoding (and with
    * which codec budget) before any decoder runs. Unparseable blobs
    * come back container="unknown" with null fields — triage must
    * classify bad blobs, not die on them. Plain projection shape: no
    * shuffle, streams row by row. */
  def containerMeta(df: DataFrame, idCol: String = "id",
                    bytesCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        ContainerMeta.parse(bytes) match {
          case Some(m) => (id, m.container, Option(m.brand), Option(m.durationMs),
            Option(m.nTracks), Option(m.width), Option(m.height))
          case None => (id, "unknown", None: Option[String], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long])
        }
      }
      .toDF(idCol, "container", "brand", "duration_ms", "n_tracks", "width", "height")
  }

  /** Compressed-audio frame-header triage over a blob table
    * ([[ContainerMeta.parseAudio]], r15): MP3 / ADTS-AAC sync-word
    * walk — version/layer/bitrate/sample-rate tables, ID3v2 skip, CBR
    * duration estimate — the decide-what-to-decode pass for the audio
    * family whose decode is environment-blocked (no pure-JDK MP3/AAC
    * provider). Unparseable blobs yield nulls, never a failure. Same
    * 100 TB shape as [[containerMeta]]: one narrow mapPartitions pass
    * over header-sized byte prefixes, zero shuffles. */
  def audioHeaderMeta(df: DataFrame, idCol: String = "id",
                      bytesCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        ContainerMeta.parseAudio(bytes) match {
          case Some(m) => (id, Option(m.codec), Option(m.version), Option(m.layer),
            Option(m.sampleRate), Option(m.channels), Option(m.nFrames),
            Option(m.streamBytes), Option(m.bitrateKbps), Option(m.durationMs))
          case None => (id, None: Option[String], None: Option[String],
            None: Option[Long], None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long],
            None: Option[Long])
        }
      }
      .toDF(idCol, "codec", "version", "layer", "sample_rate", "channels",
        "n_frames", "stream_bytes", "bitrate_kbps", "duration_ms")
  }

  /** Keyframe byte-range planning over a blob table
    * ([[ContainerMeta.keyframeIndex]]): per blob, the sync-sample count
    * and the byte-range envelope a fetch planner needs — n_samples,
    * n_keyframes, first/last keyframe offsets, total keyframe bytes.
    * Blobs without a resolvable sample table (non-MP4, fragmented,
    * corrupt) yield nulls, never a failure. Same shape as
    * [[containerMeta]]: one narrow mapPartitions pass, no shuffle —
    * stbl tables are KBs regardless of blob size. */
  def keyframeIndex(df: DataFrame, idCol: String = "id",
                    bytesCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        ContainerMeta.keyframeIndex(bytes) match {
          case Some(t) =>
            val ks = t.keyframes
            (id, Option(t.nSamples), Option(ks.length.toLong),
              ks.headOption.map(_.offset), ks.lastOption.map(_.offset),
              Option(ks.map(_.size).sum))
          case None => (id, None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long])
        }
      }
      .toDF(idCol, "n_samples", "n_keyframes", "first_kf_offset",
        "last_kf_offset", "kf_bytes")
  }

  /** REAL video-frame decode for the one codec family the bare JDK can
    * read: MJPEG-in-ISO-BMFF, where every video sample IS a baseline
    * JPEG and `javax.imageio` is the production decoder (the q37
    * argument). Composes the two verified pieces end to end: the
    * keyframe byte-range planner ([[ContainerMeta.keyframeIndex]] —
    * stss/stsz/stsc/stco resolved to exact (offset, size) ranges)
    * selects the sync samples, ONLY those byte ranges are sliced out
    * of the blob (at 100 TB the slice is an object-store range GET —
    * no other frame's bytes are fetched or decoded), and each frame
    * hashes through the q85 [[Decoder.aHash]] (8×8 integer-mean grid,
    * cross-multiplied threshold). Output: one row per keyframe —
    * (id, sample, ahash_hi, ahash_lo). Blobs with no resolvable sample
    * table and ranges falling outside the blob are skipped, never a
    * failure; an undecodable frame INSIDE a declared range throws
    * (loud, the q37/q85 contract — a corrupt keyframe is data worth
    * failing on, not an absent feature). One decoder per partition,
    * rows streamed, zero shuffles. H.264/H.265/VP9 sync samples remain
    * out of reach (no JDK decoder); the planner + slice + hash
    * plumbing here is exactly what a real codec would ride. */
  def mjpegKeyframeHashes(df: DataFrame, idCol: String = "id",
                          bytesCol: String = "media",
                          decoder: Decoder = new ImageIODecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        decoder.init()
        rows.flatMap { case (id, bytes) =>
          ContainerMeta.keyframeIndex(bytes) match {
            case Some(t) => t.keyframes.iterator.flatMap { kf =>
              if (kf.offset < 0 || kf.size <= 0 ||
                  kf.offset + kf.size > bytes.length) None
              else {
                val frame = java.util.Arrays.copyOfRange(
                  bytes, kf.offset.toInt, (kf.offset + kf.size).toInt)
                val (hi, lo) = decoder.aHash(frame, "image/jpeg")
                Some((id, kf.sampleNumber, hi, lo))
              }
            }
            case None => Iterator.empty
          }
        }
      }
      .toDF(idCol, "sample", "ahash_hi", "ahash_lo")
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
