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
    // NOT spread (r18): unlike the q151 JPEG path, spreading this map
    // over 32 tasks REGRESSED it 1.1 → 2.9 s (remeasure-confirmed
    // cross-round mover) — javax.sound's AudioSystem provider lookup
    // serializes concurrent readers, so 32 contending threads lose to
    // one uncontended task at this size. Left single-partition.
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

  /** Container-metadata triage under the hard signal: a deterministic
    * MP4 (ISO BMFF boxes, doc_id % 5 != 0) or Matroska (EBML elements,
    * doc_id % 5 == 0) byte stream per document — duration, track count
    * and video dims are integer functions of doc_id, written
    * executor-side by an independent builder (spec-layout writes, not
    * the parser's tables) — parsed back through the production
    * [[Multimodal.containerMeta]] path. Every emitted field is an
    * integer the oracle re-derives from the same formulas, so a
    * mis-parsed offset, a wrong fixed-point shift, or a missed track
    * breaks the hash. No decode anywhere: this is the header-triage
    * pass a 100 TB video pipeline runs before deciding what to decode. */
  def containerMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bytes =
            if (id % 5 == 0)
              mkvFixture(ticks = 2000 + id % 7000, nTracks = 1 + (id % 2).toInt,
                w = 160 + (id % 8) * 16, h = 90 + (id % 8) * 9)
            else
              mp4Fixture(durMs = 1000 + id % 9000, nTracks = 1 + (id % 3).toInt,
                w = 160 + (id % 8) * 16, h = 90 + (id % 8) * 9)
          (id, bytes)
        }
      }.toDF("id", "media")
    Multimodal.containerMeta(blobs)
      .select(col("id").as("doc_id"), col("container"), col("brand"),
        col("duration_ms"), col("n_tracks"), col("width"), col("height"))
      .orderBy(col("doc_id"))
  }

  // ---- fixture builders: independent spec-layout writers -------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** ISO BMFF box: 32-bit size + fourcc + payload. */
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }

  /** identity transform matrix all tkhd/mvhd boxes carry */
  private val Matrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** Deterministic minimal MP4: ftyp + moov(mvhd + nTracks × trak(tkhd));
    * the FIRST track is the video track carrying 16.16 dims, the rest
    * declare 0×0 (the audio-track convention). timescale 1000 so
    * duration ticks == milliseconds. */
  private def mp4Fixture(durMs: Long, nTracks: Int, w: Long, h: Long): Array[Byte] = {
    val mvhd = box("mvhd",
      be32(0), // version 0 + flags
      be32(0), be32(0), // creation, modification
      be32(1000), be32(durMs), // timescale, duration
      be32(0x00010000L), be16(0x0100), Array.fill[Byte](10)(0), // rate, volume, reserved
      Matrix, Array.fill[Byte](24)(0), be32(nTracks + 1L))
    val traks = (1 to nTracks).map { tid =>
      val (tw, th) = if (tid == 1) (w, h) else (0L, 0L)
      box("trak", box("tkhd",
        be32(7), // version 0, flags: enabled|in-movie|in-preview
        be32(0), be32(0), be32(tid.toLong), be32(0), be32(durMs),
        Array.fill[Byte](8)(0), be16(0), be16(0), be16(0), be16(0),
        Matrix, be32(tw << 16), be32(th << 16)))
    }
    box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200), "isom".getBytes("US-ASCII")) ++
      box("moov", (mvhd +: traks): _*)
  }

  /** EBML element: id bytes + 8-byte size vint + payload (a non-minimal
    * size encoding is valid EBML and keeps the writer trivial). */
  private def el(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val size = Array[Byte](0x01) ++
      (0 until 7).map(i => ((body.length.toLong >> (8 * (6 - i))) & 0xff).toByte).toArray
    id ++ size ++ body
  }
  private def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
  private def uintEl(eid: Array[Byte], v: Long): Array[Byte] = el(eid, be32(v))

  /** Deterministic minimal Matroska: EBML header (DocType matroska) +
    * Segment(Info(TimestampScale, Duration float64) + Tracks(nTracks ×
    * TrackEntry, first carries Video(PixelWidth, PixelHeight))).
    * TimestampScale 1e6 ns so Duration ticks == milliseconds. */
  private def mkvFixture(ticks: Long, nTracks: Int, w: Long, h: Long): Array[Byte] = {
    val header = el(id(0x1a, 0x45, 0xdf, 0xa3),
      uintEl(id(0x42, 0x86), 1), // EBMLVersion
      el(id(0x42, 0x82), "matroska".getBytes("US-ASCII"))) // DocType
    val durBits = java.lang.Double.doubleToLongBits(ticks.toDouble)
    val info = el(id(0x15, 0x49, 0xa9, 0x66),
      uintEl(id(0x2a, 0xd7, 0xb1), 1000000L), // TimestampScale
      el(id(0x44, 0x89), // Duration (float64)
        (0 until 8).map(i => ((durBits >> (8 * (7 - i))) & 0xff).toByte).toArray))
    val entries = (1 to nTracks).map { tid =>
      val video =
        if (tid == 1) el(id(0xe0), uintEl(id(0xb0), w), uintEl(id(0xba), h))
        else Array.empty[Byte]
      el(id(0xae), uintEl(id(0xd7), tid.toLong), video) // TrackEntry
    }
    val tracks = el(id(0x16, 0x54, 0xae, 0x6b), entries: _*)
    header ++ el(id(0x18, 0x53, 0x80, 0x67), info, tracks) // Segment
  }

  /** Compressed-audio frame-header triage under the hard signal (q157,
    * r15): a deterministic MP3 (doc_id % 3 != 0) or ADTS-AAC
    * (doc_id % 3 == 0) byte stream per document — version, layer,
    * bitrate index, sample-rate index, padding, channel mode, frame
    * count, an optional ID3v2 tag and optional leading junk are all
    * integer functions of doc_id, written bit-by-bit by an independent
    * header writer (not the parser's tables) — walked back through the
    * production [[ContainerMeta.parseAudio]] sync-word pass. The oracle
    * re-derives every field including the frame-length arithmetic
    * (spf/8 × kbps×1000 / rate + pad) and the CBR duration estimate,
    * so a wrong table entry, a mis-shifted header field, a botched
    * ID3v2 syncsafe skip, or a false-sync acceptance breaks the hash.
    * No decode anywhere — this is the decide-what-to-decode pass for
    * the audio family with no pure-JDK decoder. */
  def audioHeaders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val stream =
            if (id % 3 == 0)
              adtsFixture(versionBit = (id % 2).toInt,
                sfi = 3 + (id % 6).toInt, channels = 1 + (id % 2).toInt,
                frameLen = 107 + (id % 200).toInt, nFrames = 3 + (id % 15).toInt)
            else
              mp3Fixture(mpeg1 = id % 2 == 0,
                layer = if (id % 4 == 1) 2 else 3,
                brIdx = 1 + (id % 14).toInt, srIdx = (id % 3).toInt,
                pad = ((id % 5) % 2).toInt, mono = (id % 7) % 2 == 1,
                nFrames = 4 + (id % 12).toInt)
          val id3 = if (id % 4 == 0) id3v2Fixture(20 + (id % 100).toInt)
            else Array.empty[Byte]
          val junk = if (id % 7 == 0) Array[Byte]('A', 'A', 'A')
            else Array.empty[Byte]
          (id, id3 ++ junk ++ stream)
        }
      }.toDF("id", "media")
    Multimodal.audioHeaderMeta(blobs)
      .select(col("id").as("doc_id"), col("codec"), col("version"),
        col("layer"), col("sample_rate"), col("channels"), col("n_frames"),
        col("stream_bytes"), col("bitrate_kbps"), col("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** ID3v2.4 tag: header with syncsafe size + zero body (content is
    * opaque to the triage pass — only the skip arithmetic matters). */
  private def id3v2Fixture(size: Int): Array[Byte] =
    Array[Byte]('I', 'D', '3', 4, 0, 0,
      ((size >> 21) & 0x7f).toByte, ((size >> 14) & 0x7f).toByte,
      ((size >> 7) & 0x7f).toByte, (size & 0x7f).toByte) ++
      Array.fill[Byte](size)(0)

  private val Mp3KbpsV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val Mp3KbpsV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3KbpsV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** nFrames MPEG audio frames, headers written bit-field by bit-field
    * (frame bodies zero — triage never reads them). */
  private def mp3Fixture(mpeg1: Boolean, layer: Int, brIdx: Int, srIdx: Int,
                         pad: Int, mono: Boolean, nFrames: Int): Array[Byte] = {
    val kbps =
      if (mpeg1 && layer == 2) Mp3KbpsV1L2(brIdx)
      else if (mpeg1) Mp3KbpsV1L3(brIdx)
      else Mp3KbpsV2L23(brIdx)
    val rate = (if (mpeg1) Array(44100, 48000, 32000)
      else Array(22050, 24000, 16000))(srIdx)
    val spf = if (layer == 2 || mpeg1) 1152 else 576
    val flen = spf / 8 * kbps * 1000 / rate + pad
    val verBits = if (mpeg1) 3 else 2
    val layerBits = 4 - layer // L2 → 10, L3 → 01
    val frame = new Array[Byte](flen)
    frame(0) = 0xff.toByte
    frame(1) = (0xe0 | (verBits << 3) | (layerBits << 1) | 1).toByte // no CRC
    frame(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    frame(3) = (((if (mono) 3 else 0) << 6) & 0xff).toByte
    Array.fill(nFrames)(frame).flatten
  }

  /** nFrames ADTS frames (7-byte headers, protection absent, AAC-LC
    * profile, buffer fullness 0x7ff). */
  private def adtsFixture(versionBit: Int, sfi: Int, channels: Int,
                          frameLen: Int, nFrames: Int): Array[Byte] = {
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xff.toByte
    frame(1) = (0xf0 | (versionBit << 3) | 1).toByte // layer 00, no CRC
    frame(2) = ((1 << 6) | (sfi << 2) | ((channels >> 2) & 1)).toByte // AAC-LC
    frame(3) = (((channels & 3) << 6) | ((frameLen >> 11) & 3)).toByte
    frame(4) = ((frameLen >> 3) & 0xff).toByte
    frame(5) = (((frameLen & 7) << 5) | 0x1f).toByte
    frame(6) = 0xfc.toByte
    Array.fill(nFrames)(frame).flatten
  }

  /** Keyframe byte-range planning under the hard signal: a
    * deterministic MP4 per document whose `stbl` tables — stss sync
    * samples every g, per-sample stsz sizes, a single uniform-spc stsc
    * run, stco chunk offsets — are integer functions of doc_id, written
    * by the independent spec-layout builder and resolved back through
    * the production [[Multimodal.keyframeIndex]] path
    * ([[graft.ops.ContainerMeta.keyframeIndex]]). The emitted envelope
    * (sample count, keyframe count, first/last keyframe OFFSET, total
    * keyframe bytes) exercises the full chunk arithmetic: a keyframe's
    * offset is its chunk's stco entry plus the sizes of the samples
    * before it inside that chunk — one wrong run resolution or
    * intra-chunk sum breaks the hash. This is the fetch-planning pass
    * between header triage (q45) and frame decode: at 100 TB you list
    * ranges from KBs of tables and range-GET only sync samples. */
  def keyframeIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .as[Long]
      .mapPartitions(_.map(id => (id, mp4KfFixture(id))))
      .toDF("id", "media")
    Multimodal.keyframeIndex(blobs)
      .select(col("id").as("doc_id"), col("n_samples"), col("n_keyframes"),
        col("first_kf_offset"), col("last_kf_offset"), col("kf_bytes"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic MP4 with a full sample table:
    * ftyp + moov(mvhd + trak(tkhd + mdia(minf(stbl(stss stsz stsc stco))))).
    *   samples     s   = 10 + id % 20
    *   sync gap    g   = 1 + id % 5   (stss = 1, 1+g, …)
    *   chunking    spc = 1 + id % 3   (one stsc run; last chunk partial)
    *   sizes       sz(n) = 100 + ((id + n) % 50),  n 1-based
    *   offsets     stco(c) = 4096 + 1000·c,        c 0-based */
  private def mp4KfFixture(docId: Long): Array[Byte] = {
    val s = (10 + docId % 20).toInt
    val g = (1 + docId % 5).toInt
    val spc = (1 + docId % 3).toInt
    val nkf = 1 + (s - 1) / g
    val chunks = (s + spc - 1) / spc
    val stss = box("stss", be32(0), be32(nkf.toLong),
      (0 until nkf).flatMap(j => be32(1L + j.toLong * g)).toArray)
    val stsz = box("stsz", be32(0), be32(0) /* per-sample */, be32(s.toLong),
      (1 to s).flatMap(n => be32(100L + ((docId + n) % 50))).toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(spc.toLong), be32(1))
    val stco = box("stco", be32(0), be32(chunks.toLong),
      (0 until chunks).flatMap(c => be32(4096L + 1000L * c)).toArray)
    val mdia = box("mdia", box("minf", box("stbl", stss, stsz, stsc, stco)))
    val tkhd = box("tkhd",
      be32(7), be32(0), be32(0), be32(1), be32(0), be32(1000),
      Array.fill[Byte](8)(0), be16(0), be16(0), be16(0), be16(0),
      Matrix, be32(320L << 16), be32(180L << 16))
    val mvhd = box("mvhd",
      be32(0), be32(0), be32(0), be32(1000), be32(1000),
      be32(0x00010000L), be16(0x0100), Array.fill[Byte](10)(0),
      Matrix, Array.fill[Byte](24)(0), be32(2L))
    box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200), "isom".getBytes("US-ASCII")) ++
      box("moov", mvhd, box("trak", tkhd, mdia))
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
  /** q151: REAL MJPEG video-frame decode riding the keyframe planner —
    * the composition of three verified pieces (VERDICT r13 #4): the
    * q56 sample-table resolution selects sync-sample byte ranges, the
    * q37 `javax.imageio` path decodes each sliced JPEG frame, the q85
    * aHash fingerprints its pixels. The fixture is a deterministic
    * MJPEG-in-ISO-BMFF file per document: every sample in `mdat` is a
    * REAL baseline JPEG (encoded executor-side) whose 8×8-pixel cells
    * carry a 0/255 block pattern keyed by (doc_id, sample); `stss`
    * marks every g-th sample sync, `stsz` carries the true JPEG byte
    * sizes, `stsc` packs 2 samples per chunk so a keyframe's offset
    * exercises the chunk-base + intra-chunk-sum arithmetic against
    * REAL variable-length payloads, and `stco` holds the actual file
    * offsets.
    *
    * Exactness argument (why a LOSSY codec can sit under the hash
    * gate): each aHash cell is one uniform 8×8 JPEG luma block at 0 or
    * 255 — its DCT is DC-only, so quantization error is a few
    * luminance units and ringing is zero; the aHash threshold compares
    * a cell's mean against the global mean (always 60+ units away for
    * a mixed 0/255 pattern), so every decoded bit equals the PATTERN
    * bit, which the oracle re-derives in integer arithmetic. The
    * mod-3 pattern over 64 cells is always mixed (both colors
    * present), so the threshold is never degenerate. Decode skipping
    * is observable: non-sync samples are real JPEGs in the blob, and a
    * decoder that read them would emit extra rows and break the
    * row-count/hash. */
  def mjpegFrameHashes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // every 7th doc: the fixture's JPEG ENCODE of ~6 frames/doc
    // dominates the query's cost (production blobs would already
    // exist; decode-only is the real operator), and a seventh of the
    // corpus carries the same per-image decode signal (the subsample
    // is in the oracle too — nothing silent)
    // Spread BEFORE the heavy per-id encode/decode map (r18, VERDICT
    // r17 Next #5): distinct() emits a few KB of ids, which AQE
    // coalesces to ~1 post-shuffle partition — and the MJPEG fixture
    // encode plus the downstream keyframe decode then ran effectively
    // single-threaded (measured c8/c32 ≈ 1.0 at sf0.1; 33 s at sf1.0).
    // Repartitioning the ID frame costs a shuffle of a few KB and gives
    // the decode map the session's full parallelism.
    val blobs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .filter(col("doc_id") % 7 === 0)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions(_.map(id => (id, mjpegFixture(id))))
      .toDF("id", "media")
    Multimodal.mjpegKeyframeHashes(blobs)
      .select(col("id").as("doc_id"), col("sample"),
        col("ahash_hi"), col("ahash_lo"))
      .orderBy(col("doc_id"), col("sample"))
  }

  /** One 64×64 RGB frame: aHash cell (cx, cy) — an exact 8×8 pixel
    * block — is 255-gray iff (docId·31 + n·17 + cy·8 + cx) % 3 == 0,
    * else 0. Encoded as a REAL baseline JPEG via javax.imageio. */
  private def jpegFrame(docId: Long, n: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val v = if ((docId * 31 + n * 17 + cy * 8 + cx) % 3 == 0) 255 else 0
        val rgb = (v << 16) | (v << 8) | v
        var y = cy * 8
        while (y < cy * 8 + 8) {
          var x = cx * 8
          while (x < cx * 8 + 8) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  /** Deterministic MJPEG/ISO-BMFF: ftyp + moov(mvhd + trak(tkhd +
    * mdia(minf(stbl(stss stsz stsc stco))))) + mdat holding s REAL
    * JPEG frames back to back.
    *   samples   s   = 4 + id % 5
    *   sync gap  g   = 1 + id % 3   (stss = 1, 1+g, …)
    *   chunking  spc = 2            (stsc one run; last chunk partial)
    *   stsz      true JPEG byte lengths (variable!)
    *   stco      absolute file offsets of each chunk's first sample
    * The moov is built twice: once with placeholder offsets to measure
    * the header length (entry counts fix the size), then with the real
    * offsets. */
  private def mjpegFixture(docId: Long): Array[Byte] = {
    val s = (4 + docId % 5).toInt
    val g = (1 + docId % 3).toInt
    val spc = 2
    val frames = (1 to s).map(n => jpegFrame(docId, n.toLong))
    val sizes = frames.map(_.length.toLong)
    val nkf = 1 + (s - 1) / g
    val chunks = (s + spc - 1) / spc
    val stss = box("stss", be32(0), be32(nkf.toLong),
      (0 until nkf).flatMap(j => be32(1L + j.toLong * g)).toArray)
    val stsz = box("stsz", be32(0), be32(0) /* per-sample */, be32(s.toLong),
      sizes.flatMap(be32).toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(spc.toLong), be32(1))
    val tkhd = box("tkhd",
      be32(7), be32(0), be32(0), be32(1), be32(0), be32(1000),
      Array.fill[Byte](8)(0), be16(0), be16(0), be16(0), be16(0),
      Matrix, be32(64L << 16), be32(64L << 16))
    val mvhd = box("mvhd",
      be32(0), be32(0), be32(0), be32(1000), be32(1000),
      be32(0x00010000L), be16(0x0100), Array.fill[Byte](10)(0),
      Matrix, Array.fill[Byte](24)(0), be32(2L))
    def moovWith(offsets: Seq[Long]): Array[Byte] = {
      val stco = box("stco", be32(0), be32(chunks.toLong),
        offsets.flatMap(be32).toArray)
      box("moov", mvhd,
        box("trak", tkhd, box("mdia", box("minf", box("stbl", stss, stsz, stsc, stco)))))
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"))
    val headerLen =
      ftyp.length + moovWith(Seq.fill(chunks)(0L)).length + 8 // + mdat header
    val cum = sizes.scanLeft(0L)(_ + _) // bytes before 0-based sample n
    val offsets = (0 until chunks).map(c => headerLen + cum(c * spc))
    ftyp ++ moovWith(offsets) ++ box("mdat", frames.flatten.toArray)
  }

  def imageDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (w, h) = (32, 16) // 4×2 grid of exact 8×8 cells
    // every 4th doc: the PNG encode/decode fixture dominates the query's
    // cost and a quarter of the corpus carries the same per-pixel decode
    // signal (the subsample is in the oracle too — nothing silent)
    val pngs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .filter(col("doc_id") % 4 === 0)
      // spread before the PNG encode+decode map (r18, the q151 finding)
      .repartition(spark.sparkContext.defaultParallelism)
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

  /** q85: perceptual-hash (aHash) image near-dup pairs over REAL
    * decoded pixels. The fixture plants near-duplicate families: the
    * pixel pattern is keyed by `doc_id % M` (same base ⇒ same image)
    * with one `(doc_id / M)`-dependent column brightness-shifted — so
    * family members are near- but not exact duplicates and Hamming
    * distance does real work. Candidates form ONLY inside 16-bit hash
    * bands (never all-pairs — the LSH cap discipline applied to
    * perceptual hashes); exact Hamming over the (hi, lo) halves
    * verifies. The oracle re-derives every hash bit from the fixture
    * formula (integer cell sums, cellSum·64 > totalSum), the same band
    * join, and bit_count-XOR Hamming.
    *
    * M SCALES WITH THE CORPUS (round 13 — the SCALING q85 FLAG's root
    * cause): with the original fixed `% 29` the fixture admits only
    * 232 distinct images, so ×10 ids densify each identical-image
    * class ×10 and the matched-pair OUTPUT grows ~×119 (measured:
    * 2,770 → 330,508 identical pairs sf0.1→sf1.0) — quadratic
    * workload by fixture saturation, not engine super-linearity.
    * `M = max(29, odd(n/43))` keeps members-per-class ≈ 5.4 at every
    * scale (odd M keeps the doc_id%4 ingest filter from collapsing
    * residue classes), and is EXACTLY 29 at the driver's sf ≤ 0.1 —
    * correctness outputs are bit-identical to the fixed-modulus
    * fixture there. The extra count() is one tiny job over the
    * distinct-id frame (fixture sizing, not operator work). */
  def imagePHashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (w, h) = (32, 16) // 8×8 grid of equal 4×2 cells
    val idsDf = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .filter(col("doc_id") % 4 === 0)
      .as[Long]
    val n = idsDf.count()
    val m0 = n / 43
    val m = math.max(29L, if (m0 % 2 == 0) m0 + 1 else m0)
    val pngs = idsDf
      .mapPartitions { it =>
        it.map { id =>
          val base = id % m
          val pcol = ((id / m) % 32).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var r = ((base * 31 + x * 7 + y * 13) % 256).toInt
              val g = ((base * 17 + x * 11 + y * 3) % 256).toInt
              val b = ((base * 23 + x * 5 + y * 19) % 256).toInt
              if (x == pcol) r = (r + 128) % 256
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
    val hashes = Multimodal.imageAHashes(pngs,
        decoder = new Multimodal.ImageIODecoder)
      .select(col("id").as("doc_id"), col("ahash_hi"), col("ahash_lo"))
    val bands = hashes.select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        explode(array(
          struct(lit(0).as("bi"), (col("ahash_lo").bitwiseAND(lit(65535L))).as("bv")),
          struct(lit(1).as("bi"), shiftright(col("ahash_lo"), 16).bitwiseAND(lit(65535L)).as("bv")),
          struct(lit(2).as("bi"), (col("ahash_hi").bitwiseAND(lit(65535L))).as("bv")),
          struct(lit(3).as("bi"), shiftright(col("ahash_hi"), 16).bitwiseAND(lit(65535L)).as("bv"))
        )).as("band"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
    val a = bands.select(col("doc_id").as("a_id"), col("ahash_hi").as("hi_a"),
      col("ahash_lo").as("lo_a"), col("bi"), col("bv"))
    val b = bands.select(col("doc_id").as("b_id"), col("ahash_hi").as("hi_b"),
      col("ahash_lo").as("lo_b"), col("bi"), col("bv"))
    a.join(b, Seq("bi", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 12)
      .orderBy(col("a_id"), col("b_id"))
  }
}
