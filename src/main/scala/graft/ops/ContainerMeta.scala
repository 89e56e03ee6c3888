package graft.ops

/** Container-header metadata WITHOUT decode — the triage step of a
  * multimodal pipeline: at 100 TB you read a few hundred header bytes
  * per blob to decide duration/dims/track shape BEFORE spending a
  * decoder (and its codec licence) on it. Parses the two container
  * families that dominate video corpora:
  *  - MP4 / ISO BMFF (ISO 14496-12): box walk → `ftyp` major brand,
  *    `moov/mvhd` timescale+duration, `trak` count, `trak/tkhd`
  *    16.16-fixed track dims (version 0 and 1 layouts);
  *  - Matroska / WebM (EBML, RFC 8794): vint walk → `DocType`,
  *    `Segment/Info` TimestampScale+Duration, `Tracks/TrackEntry`
  *    count, `Video` PixelWidth/PixelHeight.
  * Pure integer/IEEE parsing, no codec, no JDK service provider —
  * which is exactly why it works where full video decode is stubbed
  * (Multimodal.StubDecoder note). Truncated/foreign bytes parse to
  * None, never throw: a corpus triage pass must not die on one bad
  * blob.
  *
  * Reference corpus note: pigeon-optics stores attachments as opaque
  * blobs and never introspects them (attachments.js); this operator is
  * part of the LLM-pipeline extension set, not a reference port.
  */
object ContainerMeta {

  /** One container's header summary. `width`/`height` are the first
    * video track's dims (0 when no video track declares any). */
  final case class Meta(container: String, brand: String, durationMs: Long,
                        nTracks: Long, width: Long, height: Long)

  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (isMp4(bytes)) parseMp4(bytes)
      else if (isEbml(bytes)) parseMkv(bytes)
      else None
    } catch { case _: Exception => None } // truncated/corrupt → not parseable

  /** One keyframe's byte range in the file: read [offset, offset+size)
    * and you have a decodable sync sample — no bytes of the non-key
    * frames between them are touched. */
  final case class KeyframeRange(sampleNumber: Long, offset: Long, size: Long)

  /** The resolved sample table: total sample count + keyframe ranges. */
  final case class KeyframeTable(nSamples: Long, keyframes: Vector[KeyframeRange])

  /** Sanity cap on emitted keyframe ranges. Only reachable on the
    * uniform-stsz + no-stss (all-sync) path, where the sample count is a
    * raw be32 with no table bytes to bound it against: 2^22 ≈ 4.2M sync
    * samples is ~19 hours of all-sync 60 fps video and ~100 MB of
    * ranges — anything larger is corrupt-or-absurd and is refused
    * (None) rather than materialized (ADVICE r6: a crafted count up to
    * ~4.3e9 must not become a multi-GB allocation). */
  val MaxKeyframes: Long = 1L << 22

  /** Keyframe byte-range index of the FIRST MP4 track carrying a full
    * sample table — the byte-range PLANNING step between header triage
    * ([[parse]]) and frame decode: a 100 TB video pipeline lists
    * (offset, size) per sync sample from ~KBs of `stbl` tables, then
    * fetches ONLY those ranges (object-store range GETs), never the
    * full blob. Walks `trak/mdia/minf/stbl`:
    *  - `stss` sync-sample numbers (absent ⇒ EVERY sample is a sync
    *    sample, per ISO 14496-12 8.6.2);
    *  - `stsz` sizes (uniform `sample_size` or per-sample table);
    *  - `stco`/`co64` chunk offsets (32- and 64-bit);
    *  - `stsc` sample→chunk runs, resolved exactly: a keyframe's
    *    offset = its chunk's offset + sizes of the samples before it
    *    within that chunk.
    * Matroska keyframe listing needs Cues/Cluster scanning past the
    * header — out of scope here (None), as is a file with no sample
    * table (fragmented MP4). Truncated/corrupt bytes → None, never a
    * throw. */
  def keyframeIndex(bytes: Array[Byte]): Option[KeyframeTable] =
    try {
      if (isMp4(bytes)) parseKeyframes(bytes) else None
    } catch { case _: Exception => None }

  // ------------------------------------------------------------ MP4

  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes of [from, to): (type, payloadStart, payloadEnd).
    * A box whose declared size escapes the range is clamped and ends
    * the walk — truncated input degrades, never loops or overruns. */
  private def boxes(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var off = lo
      def hasNext: Boolean = off + 8 <= hi
      def next(): (String, Int, Int) = {
        val size32 = be32(b, off)
        val typ = fourcc(b, off + 4)
        val payload: Long =
          if (size32 == 1L) off + 16L else off + 8L
        val end: Long =
          if (size32 == 1L) off + be64(b, off + 8)  // largesize
          else if (size32 == 0L) hi.toLong          // runs to end of file
          else off + size32
        val clamped = math.max(payload, math.min(end, hi.toLong)).toInt
        off = if (end <= off || end > hi) hi else clamped
        (typ, payload.toInt, clamped)
      }
    }

  private def parseMp4(b: Array[Byte]): Option[Meta] = {
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var nTracks = 0L
    var width = 0L
    var height = 0L
    boxes(b, 0, b.length).foreach {
      case ("ftyp", p, _) => brand = fourcc(b, p)
      case ("moov", mp, me) =>
        boxes(b, mp, me).foreach {
          case ("mvhd", p, _) =>
            val v = b(p) & 0xff
            if (v == 1) { timescale = be32(b, p + 20); duration = be64(b, p + 24) }
            else { timescale = be32(b, p + 12); duration = be32(b, p + 16) }
          case ("trak", tp, te) =>
            nTracks += 1
            boxes(b, tp, te).foreach {
              case ("tkhd", p, _) =>
                val v = b(p) & 0xff
                // ver/flags(4) + times/ids (v0: 20, v1: 32) +
                // reserved(8)+layer(2)+alt(2)+vol(2)+reserved(2) = 16 +
                // matrix(36) → width/height as 16.16 fixed point
                val o = p + 4 + (if (v == 1) 32 else 20) + 16 + 36
                val tw = be32(b, o) >> 16
                val th = be32(b, o + 4) >> 16
                if (width == 0 && tw > 0) { width = tw; height = th }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (timescale <= 0) None
    else Some(Meta("mp4", brand, duration * 1000L / timescale, nTracks, width, height))
  }

  /** stbl of the first trak that has a chunk-offset table, as raw
    * payload ranges; then the resolution arithmetic. */
  private def parseKeyframes(b: Array[Byte]): Option[KeyframeTable] = {
    // One parsed trak's tables: (stss|null, sizes, sampleCount, offsets, runs)
    final case class Tables(ss: Vector[Long], sizes: Either[Long, Vector[Long]],
                            n: Long, co: Vector[Long], sc: Vector[(Long, Long)])
    val candidates = Vector.newBuilder[Tables]
    boxes(b, 0, b.length).foreach {
      case ("moov", mp, me) =>
        boxes(b, mp, me).foreach {
          case ("trak", tp, te) =>
            boxes(b, tp, te).foreach {
              case ("mdia", dp, de) =>
                boxes(b, dp, de).foreach {
                  case ("minf", fp, fe) =>
                    boxes(b, fp, fe).foreach {
                      case ("stbl", sp, se) =>
                        var co: Vector[Long] = null
                        var sz: Either[Long, Vector[Long]] = null
                        var szN = 0L
                        var sc: Vector[(Long, Long)] = null
                        var ss: Vector[Long] = null
                        var bad = false
                        // Every entry-count below is a raw be32 from
                        // UNTRUSTED bytes — bound it against the box
                        // payload BEFORE materializing (the entries must
                        // physically be present in the box): a crafted
                        // count up to ~4.3e9 would otherwise allocate a
                        // multi-GB Vector, and the resulting
                        // OutOfMemoryError is an Error the Exception
                        // catch in keyframeIndex deliberately does not
                        // swallow (ADVICE r6). A count that cannot fit
                        // marks the trak corrupt → refused, not guessed.
                        def fits(p: Int, e: Int, header: Int, n: Long, entry: Int): Boolean =
                          n >= 0 && p + header + entry * n <= e
                        boxes(b, sp, se).foreach {
                          case ("stss", p, e) =>
                            val n = be32(b, p + 4)
                            if (!fits(p, e, 8, n, 4)) bad = true
                            else ss = (0 until n.toInt)
                              .map(i => be32(b, p + 8 + 4 * i)).toVector
                          case ("stsz", p, e) =>
                            val uniform = be32(b, p + 4)
                            szN = be32(b, p + 8) // sample_count, both layouts
                            if (uniform != 0) sz = Left(uniform)
                            else if (!fits(p, e, 12, szN, 4)) bad = true
                            else sz = Right((0 until szN.toInt)
                              .map(i => be32(b, p + 12 + 4 * i)).toVector)
                          case ("stco", p, e) =>
                            val n = be32(b, p + 4)
                            if (!fits(p, e, 8, n, 4)) bad = true
                            else co = (0 until n.toInt)
                              .map(i => be32(b, p + 8 + 4 * i)).toVector
                          case ("co64", p, e) =>
                            val n = be32(b, p + 4)
                            if (!fits(p, e, 8, n, 8)) bad = true
                            else co = (0 until n.toInt)
                              .map(i => be64(b, p + 8 + 8 * i)).toVector
                          case ("stsc", p, e) =>
                            val n = be32(b, p + 4)
                            if (!fits(p, e, 8, n, 12)) bad = true
                            else sc = (0 until n.toInt).map(i =>
                              (be32(b, p + 8 + 12 * i), be32(b, p + 12 + 12 * i))).toVector
                          case _ => ()
                        }
                        if (co != null && sz != null && !bad)
                          candidates += Tables(ss, sz, szN, co, sc)
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    // Track selection: a trak CARRYING stss is the video track (audio
    // tracks have no sync-sample table — under the absent-stss ⇒
    // all-sync rule an audio-first mux would report every audio sample
    // as a "keyframe" and bury the real ones). Fall back to the first
    // trak with tables only when no trak declares stss.
    val all = candidates.result()
    val picked = all.find(_.ss != null).orElse(all.headOption) match {
      case Some(t) => t
      case None => return None
    }
    val stss = picked.ss
    val sizes = picked.sizes
    val sampleCount = picked.n
    val chunkOffsets = picked.co
    val stsc = picked.sc

    def sizeOf(sample1: Long): Long = sizes match { // 1-based sample number
      case Left(u) => u
      case Right(v) => v((sample1 - 1).toInt)
    }
    val nSamples: Long = sampleCount
    // All-sync sanity bound: with uniform stsz (no per-sample table) and
    // no stss, nSamples is a raw be32 the byte-range bounds above cannot
    // check — a crafted/corrupt count up to ~4.3e9 would emit billions
    // of ranges. A keyframe INDEX that large is useless as a fetch plan
    // (4M ranges ≈ hours of all-sync 60 fps video, ~100 MB of output
    // already), so past MaxKeyframes the table is refused as
    // corrupt-or-absurd rather than materialized. The range itself is a
    // lazy NumericRange — O(1) storage regardless of nSamples.
    if (stss == null && nSamples > MaxKeyframes) return None
    val syncs: Seq[Long] =
      if (stss != null) stss.filter(s => s >= 1 && s <= nSamples)
      else 1L to nSamples // no stss ⇒ all sync (ISO 8.6.2)

    // resolve sample number → (chunk, index in chunk) through the stsc
    // runs; entry i covers chunks [first_i, first_{i+1}) at spc_i
    // samples each. Built once as cumulative spans; each sync sample
    // binary-searches the span array — O(log runs) per keyframe, no
    // per-call allocation (hour-long VBR files carry thousands of runs).
    val runs0 = if (stsc == null || stsc.isEmpty) Vector((1L, 1L)) else stsc
    // parallel arrays: firstChunk / spc / firstSampleOfRun
    val spanFirstChunk = new Array[Long](runs0.length)
    val spanSpc = new Array[Long](runs0.length)
    val spanBase = new Array[Long](runs0.length)
    locally {
      var sampleBase = 1L
      var i = 0
      while (i < runs0.length) {
        val (first, spc) = runs0(i)
        val lastChunkExcl =
          if (i + 1 < runs0.length) runs0(i + 1)._1 else chunkOffsets.length + 1L
        spanFirstChunk(i) = first; spanSpc(i) = spc; spanBase(i) = sampleBase
        sampleBase += (lastChunkExcl - first) * spc
        i += 1
      }
    }
    def resolve(sample1: Long): (Long, Long) = { // → (chunk1, indexInChunk)
      // rightmost span with firstSampleOfRun <= sample1
      var lo = 0
      var hi = spanBase.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (spanBase(mid) <= sample1) lo = mid else hi = mid - 1
      }
      val rel = sample1 - spanBase(lo)
      (spanFirstChunk(lo) + rel / spanSpc(lo), rel % spanSpc(lo))
    }
    // Cumulative size prefix for the per-sample table: prefix(k) = sum
    // of sizes of samples 1..k, so intra-chunk offset is two lookups
    // instead of a walk from the chunk's first sample — the walk was
    // O(samples-per-chunk) PER SYNC, i.e. quadratic on a crafted stsc
    // with one giant run. Summation order is the same left-to-right
    // Long adds, so offsets are bit-identical to the walked version.
    val prefix: Array[Long] = sizes match {
      case Right(v) =>
        val a = new Array[Long](v.length + 1)
        var i = 0
        while (i < v.length) { a(i + 1) = a(i) + v(i); i += 1 }
        a
      case Left(_) => null
    }
    val out = Vector.newBuilder[KeyframeRange]
    var consistent = true
    syncs.foreach { s =>
      if (consistent) {
        val (chunk1, idx) = resolve(s)
        if (chunk1 < 1 || chunk1 > chunkOffsets.length)
          consistent = false // inconsistent tables: refuse, don't fabricate
        else {
          val intra = sizes match {
            case Left(u) => idx * u
            case Right(_) => prefix((s - 1).toInt) - prefix((s - idx - 1).toInt)
          }
          val off = chunkOffsets((chunk1 - 1).toInt) + intra
          out += KeyframeRange(s, off, sizeOf(s))
        }
      }
    }
    if (consistent) Some(KeyframeTable(nSamples, out.result())) else None
  }

  // ----------------------------------------------------- Matroska/EBML

  def isEbml(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

  /** EBML element id: the vint INCLUDING its length-marker bits. */
  private def readId(b: Array[Byte], o: Int): (Long, Int) = {
    val first = b(o) & 0xff
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(len >= 1 && len <= 4, s"bad EBML id at $o")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    (v, len)
  }

  /** EBML size vint: marker bit stripped. */
  private def readSize(b: Array[Byte], o: Int): (Long, Int) = {
    val first = b(o) & 0xff
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(len >= 1 && len <= 8, s"bad EBML size at $o")
    var v = (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    (v, len)
  }

  private def uint(b: Array[Byte], o: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }

  private def float(b: Array[Byte], o: Int, n: Int): Double = n match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, o, 4).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, o, 8))
    case _ => 0.0
  }

  /** Walk EBML elements of [from, to): (id, payloadStart, payloadEnd). */
  private def ebml(b: Array[Byte], lo: Int, hi: Int): Iterator[(Long, Int, Int)] =
    new Iterator[(Long, Int, Int)] {
      private var off = lo
      def hasNext: Boolean = off + 2 <= hi
      def next(): (Long, Int, Int) = {
        val (id, ilen) = readId(b, off)
        val (sz, slen) = readSize(b, off + ilen)
        val payload = off + ilen + slen
        // all-ones size = unknown length (streaming): runs to range end
        val unknown = sz == (1L << (7 * slen)) - 1
        val end = if (unknown) hi else math.min(payload + sz, hi.toLong).toInt
        off = end
        (id, payload, end)
      }
    }

  // the handful of element ids this triage needs (RFC 8794 / Matroska spec)
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549a966L
  private val TimestampScale = 0x2ad7b1L
  private val DurationE = 0x4489L
  private val Tracks = 0x1654ae6bL
  private val TrackEntry = 0xaeL
  private val Video = 0xe0L
  private val PixelWidth = 0xb0L
  private val PixelHeight = 0xbaL

  private def parseMkv(b: Array[Byte]): Option[Meta] = {
    var docType = ""
    var tsScale = 1000000L // Matroska default
    var durationTicks = 0.0
    var nTracks = 0L
    var width = 0L
    var height = 0L
    ebml(b, 0, b.length).foreach {
      case (0x1a45dfa3L, hp, he) => // EBML header
        ebml(b, hp, he).foreach {
          case (DocType, p, e) =>
            docType = new String(b, p, e - p, java.nio.charset.StandardCharsets.US_ASCII)
          case _ => ()
        }
      case (Segment, sp, se) =>
        ebml(b, sp, se).foreach {
          case (Info, p, e) =>
            ebml(b, p, e).foreach {
              case (TimestampScale, o, oe) => tsScale = uint(b, o, oe - o)
              case (DurationE, o, oe) => durationTicks = float(b, o, oe - o)
              case _ => ()
            }
          case (Tracks, p, e) =>
            ebml(b, p, e).foreach {
              case (TrackEntry, tp, te) =>
                nTracks += 1
                ebml(b, tp, te).foreach {
                  case (Video, vp, ve) =>
                    // dims are taken as a PAIR from the first Video
                    // element declaring BOTH nonzero (same atomicity as
                    // the MP4 tkhd path) — independent first-nonzero
                    // guards could stitch width and height together
                    // from DIFFERENT TrackEntry elements, and a
                    // half-declared pair must not lock out a later
                    // complete track
                    var tw = 0L
                    var th = 0L
                    ebml(b, vp, ve).foreach {
                      case (PixelWidth, o, oe) => tw = uint(b, o, oe - o)
                      case (PixelHeight, o, oe) => th = uint(b, o, oe - o)
                      case _ => ()
                    }
                    if (width == 0 && tw > 0 && th > 0) { width = tw; height = th }
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (docType.isEmpty) None
    else Some(Meta("mkv", docType,
      // duration in ms: ticks × scale(ns per tick) / 1e6 — exact for the
      // integer-valued durations real muxers write
      math.round(durationTicks * tsScale / 1e6), nTracks, width, height))
  }

  // ------------------------------------------------- audio frame headers

  /** One audio stream's header summary (r15 — extends the
    * decide-what-to-decode pass to the compressed-audio family whose
    * DECODE is environment-blocked: no pure-JDK MP3/AAC service
    * provider, Multimodal.scala:65). Everything here comes from frame
    * HEADERS — sync-word walk, version/layer/bitrate/sample-rate
    * tables, CBR duration estimate — pure integer parsing like the MP4
    * box walk, no codec anywhere.
    *
    * `codec` is "mp3" (MPEG audio Layer I–III) or "aac" (ADTS);
    * `version` the MPEG version ("1"/"2"/"2.5" for MP3; "4"/"2" for
    * ADTS by its version bit); `layer` 1–3 for MP3, 0 for AAC.
    * `streamBytes` counts the walked complete frames (ID3v2 tag and
    * leading junk excluded); `bitrateKbps` is the header value when
    * the stream is CBR, else the stream-average (streamBytes×8×rate /
    * totalSamples, integer floor); `durationMs` = totalSamples×1000 /
    * sampleRate (integer floor). */
  final case class AudioMeta(codec: String, version: String, layer: Long,
                             sampleRate: Long, channels: Long, nFrames: Long,
                             streamBytes: Long, bitrateKbps: Long,
                             durationMs: Long)

  /** kbps by [bitrate index 1..14]; index 0 = free, 15 = invalid */
  private val Mp3BitrateV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val Mp3BitrateV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val Mp3BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val Mp3BitrateV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  /** Hz by [version][sample-rate index 0..2]; index 3 = reserved */
  private val Mp3Rates = Map(
    "1" -> Array(44100, 48000, 32000),
    "2" -> Array(22050, 24000, 16000),
    "2.5" -> Array(11025, 12000, 8000))
  /** Hz by ADTS sampling-frequency index 0..11; 12+ = reserved */
  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000)

  /** Parse an MP3 or ADTS-AAC stream's frame headers. Leading ID3v2
    * tag skipped (syncsafe size, footer flag honored); up to
    * [[MaxSyncScan]] bytes of leading junk scanned past (a candidate
    * sync must be CONFIRMED by a second valid header — or end-of-data
    * — at the computed frame boundary before the walk starts, the
    * classic false-sync guard). Truncated/foreign bytes → None, never
    * a throw; a truncated FINAL frame stops the walk (only complete
    * frames count). */
  def parseAudio(bytes: Array[Byte]): Option[AudioMeta] =
    try {
      var p = skipId3v2(bytes, 0)
      // sync scan with confirmation
      var found = -1
      val scanEnd = math.min(bytes.length - 4, p + MaxSyncScan)
      while (found < 0 && p <= scanEnd) {
        if ((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0 &&
            confirmSync(bytes, p)) found = p
        else p += 1
      }
      if (found < 0) None
      else if (isAdtsHeader(bytes, found)) walkAdts(bytes, found)
      else walkMp3(bytes, found)
    } catch { case _: Exception => None }

  /** junk tolerance ahead of the first frame — headers live at the
    * front of real files; an unbounded scan over a foreign blob would
    * walk gigabytes to say None */
  val MaxSyncScan: Int = 1 << 16

  private def skipId3v2(b: Array[Byte], at: Int): Int = {
    if (at + 10 > b.length || b(at) != 'I' || b(at + 1) != 'D' || b(at + 2) != '3')
      return at
    // 4 syncsafe bytes (7 bits each); flags bit 4 = 10-byte footer
    val size = ((b(at + 6) & 0x7f) << 21) | ((b(at + 7) & 0x7f) << 14) |
      ((b(at + 8) & 0x7f) << 7) | (b(at + 9) & 0x7f)
    val footer = if ((b(at + 5) & 0x10) != 0) 10 else 0
    math.min(b.length, at + 10 + size + footer)
  }

  private def isAdtsHeader(b: Array[Byte], p: Int): Boolean =
    // 12 sync bits + layer bits 00 distinguish ADTS from MPEG audio
    // (whose layer field is never 00 in a valid stream)
    (b(p + 1) & 0xf6) == 0xf0

  /** length of the frame starting at p, or -1 if the header is invalid */
  private def frameLength(b: Array[Byte], p: Int): Int = {
    if (p + 4 > b.length) return -1
    if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xe0) != 0xe0) return -1
    if (isAdtsHeader(b, p)) {
      if (p + 6 > b.length) return -1
      val sfi = (b(p + 2) >> 2) & 0xf
      if (sfi >= AdtsRates.length) return -1
      val len = ((b(p + 3) & 0x3) << 11) | ((b(p + 4) & 0xff) << 3) | ((b(p + 5) >> 5) & 0x7)
      if (len < 7) -1 else len
    } else {
      val verBits = (b(p + 1) >> 3) & 0x3
      val layerBits = (b(p + 1) >> 1) & 0x3
      if (verBits == 1 || layerBits == 0) return -1 // reserved
      val brIdx = (b(p + 2) >> 4) & 0xf
      val srIdx = (b(p + 2) >> 2) & 0x3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return -1 // free/bad
      val version = verBits match { case 3 => "1"; case 2 => "2"; case _ => "2.5" }
      val layer = 4 - layerBits // bits 11=L1, 10=L2, 01=L3
      val kbps = mp3Bitrate(version, layer, brIdx)
      val rate = Mp3Rates(version)(srIdx)
      val pad = (b(p + 2) >> 1) & 0x1
      if (layer == 1) (12 * kbps * 1000 / rate + pad) * 4
      else {
        // samples/frame: L2 always 1152; L3 1152 (V1) / 576 (V2/2.5)
        val spf = if (layer == 2 || version == "1") 1152 else 576
        spf / 8 * kbps * 1000 / rate + pad
      }
    }
  }

  private def mp3Bitrate(version: String, layer: Int, idx: Int): Int =
    (version, layer) match {
      case ("1", 1) => Mp3BitrateV1L1(idx)
      case ("1", 2) => Mp3BitrateV1L2(idx)
      case ("1", 3) => Mp3BitrateV1L3(idx)
      case (_, 1) => Mp3BitrateV2L1(idx)
      case _ => Mp3BitrateV2L23(idx)
    }

  /** a candidate sync is real if the next frame boundary holds another
    * valid header or exactly ends the data */
  private def confirmSync(b: Array[Byte], p: Int): Boolean = {
    val len = frameLength(b, p)
    if (len <= 0) return false
    val q = p + len
    q == b.length || (q + 4 <= b.length && frameLength(b, q) > 0)
  }

  private def walkMp3(b: Array[Byte], start: Int): Option[AudioMeta] = {
    val verBits = (b(start + 1) >> 3) & 0x3
    val version = verBits match { case 3 => "1"; case 2 => "2"; case _ => "2.5" }
    val layer = 4 - ((b(start + 1) >> 1) & 0x3)
    val srIdx = (b(start + 2) >> 2) & 0x3
    val rate = Mp3Rates(version)(srIdx)
    val mode = (b(start + 3) >> 6) & 0x3
    val channels = if (mode == 3) 1L else 2L
    val spf: Long =
      if (layer == 1) 384L
      else if (layer == 2 || version == "1") 1152L
      else 576L
    var p = start
    var nFrames = 0L
    var streamBytes = 0L
    var firstKbps = -1
    var cbr = true
    var done = false
    while (!done) {
      val len = frameLength(b, p)
      if (len <= 0 || p + len > b.length) done = true
      else {
        val kbps = mp3Bitrate(version, layer, (b(p + 2) >> 4) & 0xf)
        if (firstKbps < 0) firstKbps = kbps
        else if (kbps != firstKbps) cbr = false
        nFrames += 1
        streamBytes += len
        p += len
      }
    }
    if (nFrames == 0) return None
    val totalSamples = nFrames * spf
    val durationMs = totalSamples * 1000 / rate
    val kbps =
      if (cbr) firstKbps.toLong
      else streamBytes * 8 * rate / (totalSamples * 1000)
    Some(AudioMeta("mp3", version, layer.toLong, rate.toLong, channels,
      nFrames, streamBytes, kbps, durationMs))
  }

  private def walkAdts(b: Array[Byte], start: Int): Option[AudioMeta] = {
    val version = if (((b(start + 1) >> 3) & 0x1) == 0) "4" else "2"
    val sfi = (b(start + 2) >> 2) & 0xf
    if (sfi >= AdtsRates.length) return None
    val rate = AdtsRates(sfi).toLong
    val channels = (((b(start + 2) & 0x1) << 2) | ((b(start + 3) >> 6) & 0x3)).toLong
    var p = start
    var nFrames = 0L
    var streamBytes = 0L
    var done = false
    while (!done) {
      val len = frameLength(b, p)
      if (len <= 0 || p + len > b.length) done = true
      else { nFrames += 1; streamBytes += len; p += len }
    }
    if (nFrames == 0) return None
    val totalSamples = nFrames * 1024L // AAC-LC: 1024 PCM samples/frame
    val durationMs = totalSamples * 1000 / rate
    val kbps = streamBytes * 8 * rate / (totalSamples * 1000)
    Some(AudioMeta("aac", version, 0L, rate, channels, nFrames,
      streamBytes, kbps, durationMs))
  }
}
