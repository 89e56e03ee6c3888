package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Multimodal plumbing: schema, batch shape, partitioning — real; image
  * decode (ImageIODecoder over javax.imageio) and PCM audio decode
  * (JavaSoundDecoder over javax.sound.sampled) are REAL too; only
  * video and compressed audio use the documented STUB. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Encode `seconds` of a mono `hz` sine at `rate`, amplitude `amp`,
    * as a 16-bit PCM WAV via javax.sound.sampled. */
  private def wav(hz: Double, seconds: Double, rate: Float = 8000f,
                  amp: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("JavaSoundDecoder: real WAV decode through the Spark pipeline") {
    import spark.implicits._
    val df = Seq(
      (1L, wav(440, 1.0), "audio/wav"),            // 1 s of tone
      (2L, wav(440, 0.5, amp = 0.0), "audio/wav")) // 0.5 s of silence
      .toDF("id", "media", "mime").repartition(2)
    val out = Multimodal.audioFeatures(df).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Float]("sample_rate") == 8000f)
    assert(out(1L).getAs[Int]("channels") == 1)
    assert(out(1L).getAs[Long]("frames") == 8000L)
    assert(math.abs(out(1L).getAs[Double]("duration_sec") - 1.0) < 1e-9)
    // loudness fingerprint: a 0.5-amplitude sine has RMS 0.5/√2 ≈ 0.354
    val loud = out(1L).getSeq[Float](out(1L).fieldIndex("loudness"))
    assert(loud.length == 8)
    loud.foreach(v => assert(math.abs(v - 0.5 / math.sqrt(2)) < 0.01))
    // silence decodes to ~zero RMS in every window
    val quiet = out(2L).getSeq[Float](out(2L).fieldIndex("loudness"))
    assert(math.abs(out(2L).getAs[Double]("duration_sec") - 0.5) < 1e-9)
    quiet.foreach(v => assert(v < 1e-4))
  }

  test("JavaSoundDecoder inits once per partition; rejects non-audio bytes") {
    import spark.implicits._
    Multimodal.JavaSoundDecoder.inits.set(0)
    val df = (0 until 8).map(i => (i.toLong, wav(200 + 50 * i, 0.1), "audio/wav"))
      .toDF("id", "media", "mime").repartition(4)
    assert(Multimodal.audioFeatures(df).count() == 8)
    assert(Multimodal.JavaSoundDecoder.inits.get == 4)
    val junk = new Multimodal.JavaSoundDecoder()
    intercept[Exception](junk.decodeAudio("not audio".getBytes, "audio/wav"))
  }

  /** Encode a w×h image, left half red / right half blue, via ImageIO. */
  private def png(w: Int, h: Int, format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, buf)
    buf.toByteArray
  }

  test("ImageIODecoder: real PNG/BMP decode through the Spark pipeline") {
    import spark.implicits._
    val df = Seq(
      (1L, png(100, 60), "image/png"),
      (2L, png(30, 40, "bmp"), "image/bmp"))
      .toDF("id", "media", "mime").repartition(2)
    val out = Multimodal.imageFeatures(df, decoder = new Multimodal.ImageIODecoder)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Int]("width") == 100)
    assert(out(1L).getAs[Int]("height") == 60)
    assert(out(1L).getAs[Int]("channels") == 3)
    // 4×2 luminance grid: red (lum 1/3) left two cells, blue (1/3) right —
    // uniform here, but every value must be a real pixel mean in (0,1)
    val sig = out(1L).getSeq[Float](out(1L).fieldIndex("features"))
    assert(sig.length == 8 && sig.forall(v => v > 0f && v < 1f))
    assert(math.abs(sig(0) - 1f / 3) < 0.02, "red half mean luminance ~1/3")
    assert(out(2L).getAs[Int]("width") == 30)

    // resize really resizes: decode the output bytes and check dims
    val rz = Multimodal.resizeImages(df, 16, 12,
      decoder = new Multimodal.ImageIODecoder)
      .filter(col("id") === 1L).collect()(0)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rz.getAs[Array[Byte]]("media")))
    assert(back.getWidth == 16 && back.getHeight == 12)
    // and preserves the left-red/right-blue structure
    assert((back.getRGB(2, 6) & 0xff0000) != 0)
    assert((back.getRGB(13, 6) & 0xff) != 0)

    // single-frame formats yield exactly one frame, losslessly
    val fr = Multimodal.frameSample(df.filter(col("id") === 1L), everyNth = 1,
      decoder = new Multimodal.ImageIODecoder).collect()
    assert(fr.length == 1 && fr(0).getAs[Long]("frame_idx") == 0L)
    val f0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(fr(0).getAs[Array[Byte]]("frame")))
    assert(f0.getWidth == 100 && f0.getHeight == 60)
  }

  test("ImageIODecoder rejects undecodable bytes; inits once per partition") {
    import spark.implicits._
    Multimodal.ImageIODecoder.inits.set(0)
    val df = (0 until 8).map(i => (i.toLong, png(8 + i, 8), "image/png"))
      .toDF("id", "media", "mime").repartition(4)
    assert(Multimodal.imageFeatures(df,
      decoder = new Multimodal.ImageIODecoder).count() == 8)
    assert(Multimodal.ImageIODecoder.inits.get == 4)
    val junk = new Multimodal.ImageIODecoder
    intercept[IllegalArgumentException](junk.decodeImage("not an image".getBytes, "image/png"))
  }

  private def mediaDf = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, Array.fill[Byte](100 + i * 37)(i.toByte), "image/png")
    }.toDF("id", "media", "mime")
  }

  test("imageFeatures: schema contract + one decoder init per partition") {
    val df = mediaDf.repartition(4)
    Multimodal.StubDecoder.inits.set(0)
    val out = Multimodal.imageFeatures(df)
    assert(out.columns.toSeq == Seq("id", "width", "height", "channels", "features"))
    val rows = out.collect()
    assert(rows.length == 40)
    assert(Multimodal.StubDecoder.inits.get == 4,
      "decoder must init exactly once per partition (expensive-init contract)")
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 64)
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
    }
    // determinism: same bytes, same features
    val again = Multimodal.imageFeatures(df).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("frameSample: 1 video row explodes to N frame rows executor-side") {
    val out = Multimodal.frameSample(mediaDf, everyNth = 5)
    assert(out.columns.toSeq == Seq("id", "frame_idx", "frame"))
    val byId = out.collect().groupBy(_.getAs[Long]("id"))
    assert(byId.size == 40)
    byId.values.foreach { frames =>
      val idxs = frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq
      assert(idxs == idxs.indices.map(_ * 5L), "frame indices stride by everyNth")
    }
  }

  test("resizeImages: bytes transformed, target dims as metadata columns") {
    val out = Multimodal.resizeImages(mediaDf, 224, 224)
    assert(out.columns.toSeq == Seq("id", "media", "mime", "target_w", "target_h"))
    val r = out.filter(col("id") === 0).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("media")).startsWith("resized:224x224:"))
    assert(r.getAs[Int]("target_w") == 224)
  }

  test("containerMeta: parses MP4 v0/v1 boxes and Matroska EBML; classifies junk") {
    import spark.implicits._
    // hand-built minimal MP4 with a 64-bit-duration (version 1) mvhd —
    // the layout the fixture writer does NOT produce, so the v1 branch
    // is pinned here
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ // v1, creation/mod 64-bit
        be32(90000) ++ be64(450000) ++ // timescale 90k, duration 5 s
        Array.fill[Byte](80)(0))
    val mp4 = box("ftyp", "mp42".getBytes("US-ASCII") ++ be32(0) ++
      "mp42".getBytes("US-ASCII")) ++ box("moov", mvhdV1)
    val m = ContainerMeta.parse(mp4)
    assert(m.exists(x => x.container == "mp4" && x.brand == "mp42" &&
      x.durationMs == 5000 && x.nTracks == 0))

    // junk, truncated-mp4, and empty inputs classify, never throw
    assert(ContainerMeta.parse("not a container".getBytes).isEmpty)
    assert(ContainerMeta.parse(mp4.take(10)).isEmpty)
    assert(ContainerMeta.parse(Array.empty[Byte]).isEmpty)

    // through the Spark operator: unknown rows get null fields
    val df = Seq((1L, mp4), (2L, "junk!junk".getBytes)).toDF("id", "media")
    val out = Multimodal.containerMeta(df).orderBy("id").collect()
    assert(out(0).getAs[String]("container") == "mp4")
    assert(out(0).getAs[Long]("duration_ms") == 5000L)
    assert(out(1).getAs[String]("container") == "unknown")
    assert(out(1).isNullAt(out(1).fieldIndex("duration_ms")))
  }

  test("containerMeta fuzz: arbitrary, magic-prefixed, and truncated bytes never throw") {
    val rnd = new scala.util.Random(20260813)
    // pure random bytes, including ones that start with the real magics
    // so both parsers run past their dispatch check
    (0 until 300).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      if (b.length >= 8 && i % 3 == 0) { // force the ftyp magic
        b(4) = 'f'; b(5) = 't'; b(6) = 'y'; b(7) = 'p'
      }
      if (b.length >= 4 && i % 3 == 1) { // force the EBML magic
        b(0) = 0x1a; b(1) = 0x45; b(2) = 0xdf.toByte; b(3) = 0xa3.toByte
      }
      ContainerMeta.parse(b) // must classify or reject, never throw
    }
    // every prefix-truncation of a REAL container must parse or reject
    // cleanly — the triage pass meets half-uploaded blobs constantly
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", box("mvhd",
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(1000) ++
          be32(4321) ++ Array.fill[Byte](80)(0)))
    (0 to mp4.length).foreach(n => ContainerMeta.parse(mp4.take(n)))
    assert(ContainerMeta.parse(mp4).exists(_.durationMs == 4321))
  }

  // ---- keyframe index: spec-layout stbl builders -----------------------
  private object Kf {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.flatten.toArray
      be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
    }
    def mp4(stbl: Array[Byte]*): Array[Byte] =
      box("ftyp", "isom".getBytes("US-ASCII"), be32(0)) ++
        box("moov", box("trak", box("mdia", box("minf", box("stbl", stbl.flatten.toArray)))))
  }

  test("keyframeIndex: stsc chunk runs + intra-chunk size sums resolve exact offsets") {
    import Kf._
    // 7 samples, sizes 10..70; chunks of 3 (last partial); keyframes 1,4,6.
    // sample→chunk: 1-3→c0@1000, 4-6→c1@5000, 7→c2@9000
    //   kf 1: off 1000 (opens c0), size 10
    //   kf 4: off 5000 (opens c1), size 40
    //   kf 6: off 5000+40+50=5090 (two earlier samples in c1), size 60
    val b = mp4(
      box("stss", be32(0), be32(3), be32(1), be32(4), be32(6)),
      box("stsz", be32(0), be32(0), be32(7),
        (1 to 7).flatMap(n => be32(10L * n)).toArray),
      box("stsc", be32(0), be32(1), be32(1), be32(3), be32(1)),
      box("stco", be32(0), be32(3), be32(1000), be32(5000), be32(9000)))
    val t = ContainerMeta.keyframeIndex(b).get
    assert(t.nSamples == 7)
    assert(t.keyframes == Vector(
      ContainerMeta.KeyframeRange(1, 1000, 10),
      ContainerMeta.KeyframeRange(4, 5000, 40),
      ContainerMeta.KeyframeRange(6, 5090, 60)))
  }

  test("keyframeIndex: multiple stsc runs change samples-per-chunk mid-file") {
    import Kf._
    // 6 samples: chunks 1 (2 samples) then chunks 2.. (1 sample each)
    // sample→chunk: 1-2→c0@100, 3→c1@200, 4→c2@300, 5→c3@400, 6→c4@500
    val b = mp4(
      box("stss", be32(0), be32(2), be32(2), be32(5)),
      box("stsz", be32(0), be32(0), be32(6),
        (1 to 6).flatMap(n => be32(n.toLong)).toArray),
      box("stsc", be32(0), be32(2),
        be32(1), be32(2), be32(1),   // chunk 1: 2 samples
        be32(2), be32(1), be32(1)),  // chunks 2+: 1 sample
      box("stco", be32(0), be32(5),
        be32(100), be32(200), be32(300), be32(400), be32(500)))
    val t = ContainerMeta.keyframeIndex(b).get
    // kf 2: chunk 0, one earlier sample (size 1) → 101; kf 5: chunk 3 → 400
    assert(t.keyframes == Vector(
      ContainerMeta.KeyframeRange(2, 101, 2),
      ContainerMeta.KeyframeRange(5, 400, 5)))
  }

  test("keyframeIndex: no stss means every sample is a sync sample; uniform stsz; co64") {
    import Kf._
    val b = mp4(
      box("stsz", be32(0), be32(25) /* uniform */, be32(3)),
      box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1)),
      box("co64", be32(0), be32(3), be64(1L << 33), be64((1L << 33) + 100),
        be64((1L << 33) + 200)))
    val t = ContainerMeta.keyframeIndex(b).get
    assert(t.nSamples == 3)
    assert(t.keyframes.map(_.sampleNumber) == Vector(1L, 2L, 3L))
    assert(t.keyframes.map(_.offset) ==
      Vector(1L << 33, (1L << 33) + 100, (1L << 33) + 200))
    assert(t.keyframes.forall(_.size == 25))
  }

  test("keyframeIndex: crafted counts that cannot fit the bytes refuse, never allocate") {
    import Kf._
    // ADVICE r6 scenario: uniform stsz (no per-sample table to bound)
    // + no stss → all-sync path with sample_count = 0xFFFFFFFF. Must be
    // None (MaxKeyframes sanity cap), and must return promptly — a
    // materialized (1..4.3e9) range would OOM before failing.
    val huge = mp4(
      box("stsz", be32(0), be32(25), be32(0xffffffffL)),
      box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1)),
      box("stco", be32(0), be32(1), be32(100)))
    assert(ContainerMeta.keyframeIndex(huge).isEmpty)

    // per-entry tables claiming more entries than their box holds:
    // each must mark the trak corrupt (None), not allocate the claim
    def bad(stbl: Array[Byte]*): Unit =
      assert(ContainerMeta.keyframeIndex(mp4(stbl.flatten.toArray)).isEmpty)
    val okSz = box("stsz", be32(0), be32(25), be32(2))
    val okCo = box("stco", be32(0), be32(1), be32(100))
    bad(box("stss", be32(0), be32(0x7fffffffL), be32(1)), okSz, okCo)
    bad(box("stsz", be32(0), be32(0), be32(0x7fffffffL), be32(10)), okCo)
    bad(okSz, box("stco", be32(0), be32(0x7fffffffL), be32(100)))
    bad(okSz, box("co64", be32(0), be32(0x7fffffffL), be64(100)))
    bad(okSz, okCo, box("stsc", be32(0), be32(0x7fffffffL), be32(1), be32(1)))

    // a sane small all-sync file still parses (the cap is far away)
    val fine = mp4(
      box("stsz", be32(0), be32(25), be32(3)),
      box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1)),
      box("stco", be32(0), be32(3), be32(100), be32(200), be32(300)))
    assert(ContainerMeta.keyframeIndex(fine).get.keyframes.size == 3)
  }

  test("keyframeIndex: audio-first mux — the trak WITH stss wins, not the first trak") {
    import Kf._
    // trak 1 = audio: stco+stsz but NO stss (every sample sync under
    // the default rule); trak 2 = video with an stss. A first-trak-wins
    // picker would report thousands of audio \"keyframes\" and never
    // list the video ones.
    val audio = box("trak", box("mdia", box("minf", box("stbl",
      box("stsz", be32(0), be32(4), be32(100)),
      box("stsc", be32(0), be32(1), be32(1), be32(100), be32(1)),
      box("stco", be32(0), be32(1), be32(50000))))))
    val video = box("trak", box("mdia", box("minf", box("stbl",
      box("stss", be32(0), be32(2), be32(1), be32(3)),
      box("stsz", be32(0), be32(0), be32(4),
        (1 to 4).flatMap(n => be32(100L * n)).toArray),
      box("stsc", be32(0), be32(1), be32(1), be32(4), be32(1)),
      box("stco", be32(0), be32(1), be32(9000))))))
    val b = box("ftyp", "isom".getBytes("US-ASCII"), be32(0)) ++
      box("moov", audio, video)
    val t = ContainerMeta.keyframeIndex(b).get
    assert(t.nSamples == 4)
    assert(t.keyframes == Vector(
      ContainerMeta.KeyframeRange(1, 9000, 100),
      ContainerMeta.KeyframeRange(3, 9000 + 100 + 200, 300)))
  }

  test("keyframeIndex: junk, MKV, and table-less MP4 yield None; fuzz never throws") {
    import Kf._
    assert(ContainerMeta.keyframeIndex(Array[Byte](1, 2, 3)).isEmpty)
    // header-only MP4 (q45-style, no stbl) has no index
    val headerOnly = box("ftyp", "isom".getBytes("US-ASCII"), be32(0)) ++
      box("moov", box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(1)))
    assert(ContainerMeta.keyframeIndex(headerOnly).isEmpty)
    // keyframe pointing past the chunk table: refuse, don't fabricate
    val bad = mp4(
      box("stss", be32(0), be32(1), be32(9)),
      box("stsz", be32(0), be32(10), be32(9)),
      box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1)),
      box("stco", be32(0), be32(2), be32(100), be32(200)))
    assert(ContainerMeta.keyframeIndex(bad).isEmpty)
    val rnd = new scala.util.Random(56)
    (0 until 200).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(150))
      rnd.nextBytes(b)
      if (b.length >= 8 && i % 2 == 0) { b(4) = 'f'; b(5) = 't'; b(6) = 'y'; b(7) = 'p' }
      ContainerMeta.keyframeIndex(b) // classify or reject, never throw
    }
  }

  test("aHash: known half-black/half-white bit pattern; re-encode stable; stub deterministic") {
    // left half black, right half white → exactly the white cells
    // (grid columns 4-7 of every row) cross the global mean: each
    // 32-bit half must be 0xF0F0F0F0
    val img = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xFFFFFF)
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", b)
      b.toByteArray
    }
    val real = new Multimodal.ImageIODecoder
    val (hi, lo) = real.aHash(png(img), "image/png")
    assert(hi == 0xF0F0F0F0L && lo == 0xF0F0F0F0L,
      f"expected F0F0F0F0/F0F0F0F0, got $hi%x/$lo%x")
    // halves stay in non-negative 32-bit range by construction
    assert(hi >= 0 && hi <= 0xFFFFFFFFL && lo >= 0 && lo <= 0xFFFFFFFFL)
    // BMP re-encode of the same pixels hashes identically (the whole
    // point of a perceptual hash)
    val bmp = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmp)
    assert(real.aHash(bmp.toByteArray, "image/bmp") == ((hi, lo)))
    // stub: pure function of bytes, same masking contract
    val stub = new Multimodal.StubDecoder
    val b1 = "fake-bytes".getBytes
    assert(stub.aHash(b1, "video/mp4") == stub.aHash(b1.clone(), "video/mp4"))
    val (sh, sl) = stub.aHash(b1, "video/mp4")
    assert(sh >= 0 && sh <= 0xFFFFFFFFL && sl >= 0 && sl <= 0xFFFFFFFFL)
  }

  test("mjpegKeyframeHashes: decodes ONLY sync samples; real JPEG bits match the pattern") {
    import SparkTestBase.spark.implicits._
    // hand-rolled MJPEG: 5 frames, every 2nd sync (stss = 1, 3, 5).
    // Frames via the SAME builders the q151 fixture uses is overkill
    // here — a minimal inline container with real JPEGs suffices to
    // pin the three contracts: keyframe-only rows, correct byte-range
    // slicing against variable JPEG sizes, and hash == pattern.
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bx(t: String, p: Array[Byte]*) = {
      val b = p.flatten.toArray; be32(8L + b.length) ++ t.getBytes("US-ASCII") ++ b
    }
    def jpeg(n: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (cy <- 0 until 8; cx <- 0 until 8) {
        val v = if ((n * 17 + cy * 8 + cx) % 3 == 0) 255 else 0
        for (y <- cy * 8 until cy * 8 + 8; x <- cx * 8 until cx * 8 + 8)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    }
    val frames = (1 to 5).map(jpeg)
    val sizes = frames.map(_.length.toLong)
    val stss = bx("stss", be32(0), be32(3), be32(1), be32(3), be32(5))
    val stsz = bx("stsz", be32(0), be32(0), be32(5), sizes.flatMap(be32).toArray)
    val stsc = bx("stsc", be32(0), be32(1), be32(1), be32(2), be32(1)) // 2/chunk
    def moov(offs: Seq[Long]) = bx("moov", bx("trak", bx("mdia", bx("minf",
      bx("stbl", stss, stsz, stsc,
        bx("stco", be32(0), be32(3), offs.flatMap(be32).toArray))))))
    val ftyp = bx("ftyp", "isom".getBytes, be32(0x200), "isom".getBytes)
    val base = ftyp.length + moov(Seq(0L, 0L, 0L)).length + 8
    val cum = sizes.scanLeft(0L)(_ + _)
    val blob = ftyp ++ moov(Seq(base, base + cum(2), base + cum(4))) ++
      bx("mdat", frames.flatten.toArray)

    val out = Multimodal.mjpegKeyframeHashes(
      Seq((7L, blob)).toDF("id", "media"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 5L),
      "exactly the sync samples decode — non-key frames are never touched")
    out.foreach { case (_, n, hi, lo) =>
      var (ehi, elo) = (0L, 0L)
      for (k <- 0 until 64 if (n * 17 + k) % 3 == 0)
        if (k < 32) elo |= 1L << k else ehi |= 1L << (k - 32)
      assert((hi, lo) == ((ehi, elo)),
        s"sample $n: decoded aHash must equal the planted pattern through the JPEG round trip")
    }
    // a blob with no sample table yields no rows, never a throw
    assert(Multimodal.mjpegKeyframeHashes(
      Seq((1L, "junk".getBytes)).toDF("id", "media")).count() == 0)
  }

  test("parseAudio: MP3 tables, ID3v2 skip, junk tolerance, ADTS walk (r15)") {
    // hand-assembled MPEG1 Layer III, 128 kbps (idx 9), 44100 Hz
    // (idx 0), no padding, stereo: frame length 144*128000/44100 = 417
    def mp3Frame(brIdx: Int, pad: Int): Array[Byte] = {
      val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
      val len = 144 * kbps * 1000 / 44100 + pad
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte // V1 L3 no-CRC
      f(2) = ((brIdx << 4) | (0 << 2) | (pad << 1)).toByte
      f
    }
    val cbr = Array.fill(5)(mp3Frame(9, 0)).flatten
    val m = ContainerMeta.parseAudio(cbr).get
    assert(m.codec == "mp3" && m.version == "1" && m.layer == 3)
    assert(m.sampleRate == 44100 && m.channels == 2)
    assert(m.nFrames == 5 && m.streamBytes == 5 * 417)
    assert(m.bitrateKbps == 128)
    assert(m.durationMs == 5L * 1152 * 1000 / 44100) // 130 ms
    // VBR: mixed bitrates → stream-average, not the first header
    val vbr = (mp3Frame(9, 0) ++ mp3Frame(14, 0) ++ mp3Frame(9, 0))
    val mv = ContainerMeta.parseAudio(vbr).get
    assert(mv.nFrames == 3)
    assert(mv.bitrateKbps == mv.streamBytes * 8 * 44100 / (3L * 1152 * 1000))
    // ID3v2 tag + leading junk are skipped; a truncated final frame
    // stops the walk (only complete frames count)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 40) ++ Array.fill[Byte](40)(0)
    val withTag = id3 ++ Array[Byte]('x', 'x') ++ cbr ++ mp3Frame(9, 0).take(100)
    val mt = ContainerMeta.parseAudio(withTag).get
    assert(mt.nFrames == 5 && mt.streamBytes == 5 * 417)
    // ADTS: 7-byte headers, 48000 Hz (sfi 3), 2 channels, 300-byte frames
    def adts(n: Int, flen: Int): Array[Byte] = {
      val f = new Array[Byte](flen)
      f(0) = 0xff.toByte; f(1) = 0xf1.toByte // MPEG-4, layer 00, no CRC
      f(2) = ((1 << 6) | (3 << 2)).toByte
      f(3) = ((2 << 6) | ((flen >> 11) & 3)).toByte
      f(4) = ((flen >> 3) & 0xff).toByte
      f(5) = (((flen & 7) << 5) | 0x1f).toByte
      f(6) = 0xfc.toByte
      Array.fill(n)(f).flatten
    }
    val a = ContainerMeta.parseAudio(adts(4, 300)).get
    assert(a.codec == "aac" && a.version == "4" && a.layer == 0)
    assert(a.sampleRate == 48000 && a.channels == 2 && a.nFrames == 4)
    assert(a.durationMs == 4L * 1024 * 1000 / 48000)
    assert(a.bitrateKbps == 4L * 300 * 8 * 48000 / (4L * 1024 * 1000))
    // a single 0xFF followed by garbage must not confirm (false-sync
    // guard: the second frame boundary has to hold a valid header)
    assert(ContainerMeta.parseAudio(Array[Byte](0xff.toByte, 0xfb.toByte, 0x92.toByte, 0, 1, 2, 3)).isEmpty)
    assert(ContainerMeta.parseAudio("plain text, no audio here".getBytes).isEmpty)
    assert(ContainerMeta.parseAudio(Array.empty[Byte]).isEmpty)
  }

  test("parseAudio fuzz: arbitrary, sync-prefixed, and truncated bytes never throw") {
    val rnd = new scala.util.Random(20260816)
    (0 until 400).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      if (b.length >= 2 && i % 3 == 0) { b(0) = 0xff.toByte; b(1) = 0xfb.toByte }
      if (b.length >= 2 && i % 3 == 1) { b(0) = 0xff.toByte; b(1) = 0xf1.toByte }
      if (b.length >= 3 && i % 4 == 0) { b(0) = 'I'; b(1) = 'D'; b(2) = '3' }
      ContainerMeta.parseAudio(b) // classify or reject, never throw
    }
    // prefix truncations of a real stream parse or reject cleanly
    val full = {
      val f = new Array[Byte](104)
      f(0) = 0xff.toByte; f(1) = 0xf1.toByte
      f(2) = ((1 << 6) | (3 << 2)).toByte
      f(3) = (2 << 6 | 0).toByte; f(4) = ((104 >> 3) & 0xff).toByte
      f(5) = ((104 & 7) << 5 | 0x1f).toByte; f(6) = 0xfc.toByte
      Array.fill(3)(f).flatten
    }
    (0 to full.length).foreach { k =>
      ContainerMeta.parseAudio(full.take(k)) // never throws
    }
    assert(ContainerMeta.parseAudio(full).get.nFrames == 3)
  }

  test("balanceBySize: partition count tracks byte volume, not row count") {
    val total = mediaDf.select(sum(length(col("media")))).collect()(0).getLong(0)
    val target = total / 7
    val out = Multimodal.balanceBySize(mediaDf, target)
    assert(out.rdd.getNumPartitions == math.ceil(total.toDouble / target).toInt)
    val one = Multimodal.balanceBySize(mediaDf, total * 10)
    assert(one.rdd.getNumPartitions == 1)
  }
}
