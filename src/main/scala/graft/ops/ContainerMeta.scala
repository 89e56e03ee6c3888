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
}
