package graft.core

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Canonical binary (CBOR, RFC 8949) encoding of [[PoValue]].
  *
  * This is both the engine's physical on-wire/storage form (a BinaryType
  * column in every collection DataFrame) and the basis of the
  * content-address hash. The reference stores values the same way —
  * length-prefixed CBOR (reference: library/models/fs/objects.js:267-270)
  * — and hashes with npm `object-hash`
  * (reference: library/models/codec/object-hash.js:10-13). Byte
  * compatibility with the reference is not required (hashes only flow out
  * as opaque etags); determinism and content addressing are.
  *
  * Tags used (all from the IANA CBOR registry / RFC 8949):
  *  - 2/3: bignum;  1: epoch date (we encode integer MILLISECONDS — our
  *    own documented convention, round-trips through this codec only);
  *  - 32: URL;  258: Set;  259: Map-with-arbitrary-keys (the same tag the
  *    reference's cbor codec uses: library/models/codec/cbor.js:6-7).
  *
  * Encoding is deterministic (RFC 8949 §4.2 core requirements: shortest
  * integer forms, definite lengths). Two modes:
  *  - `encode`: preserves object/set/map insertion order (storage form —
  *    order is data, the reduce lattice is order-sensitive);
  *  - `canonical`: additionally sorts object keys, set members and map
  *    entries by their encoded bytes — the input to [[hash]], so that
  *    logically-equal values (e.g. sets in different insertion order)
  *    hash identically.
  */
object Cbor {

  // ---------------------------------------------------------------- encode

  def encode(v: PoValue): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    write(v, out)
    out.toByteArray
  }

  def canonical(v: PoValue): Array[Byte] = {
    val acc = new ChunkAcc
    writeCanonical(v, acc)
    acc.toArray
  }

  /** 64-hex sha256 of the canonical encoding — the record content hash
    * (fills the role of reference base-data-model.js:185-196 objectHash).
    * Digests the chunk rope directly; the canonical bytes are never
    * materialized as one array. */
  def hash(v: PoValue): String = {
    val acc = new ChunkAcc
    writeCanonical(v, acc)
    val md = MessageDigest.getInstance("SHA-256")
    acc.digestInto(md)
    val d = md.digest()
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Content hash of an already-encoded (insertion-order) CBOR value —
    * decode + canonical re-hash. The form Catalyst's content_hash
    * expression calls over stored value columns. */
  def hashOfEncoded(bytes: Array[Byte]): String = hash(decode(bytes))

  private def writeTypeAndLen(major: Int, n: Long, out: ByteArrayOutputStream): Unit = {
    val m = major << 5
    if (n < 24) out.write(m | n.toInt)
    else if (n < 0x100) { out.write(m | 24); out.write(n.toInt) }
    else if (n < 0x10000) { out.write(m | 25); out.write((n >> 8).toInt); out.write(n.toInt) }
    else if (n < 0x100000000L) {
      out.write(m | 26)
      var i = 24; while (i >= 0) { out.write(((n >> i) & 0xff).toInt); i -= 8 }
    } else {
      out.write(m | 27)
      var i = 56; while (i >= 0) { out.write(((n >> i) & 0xff).toInt); i -= 8 }
    }
  }

  private def writeTag(tag: Long, out: ByteArrayOutputStream): Unit =
    writeTypeAndLen(6, tag, out)

  // --------------------------------------------------- canonical encoding
  //
  // Canonical form sorts Set members and Map entries by their encoded
  // bytes, so those encodings are needed before the parent's bytes can be
  // laid out. A naive implementation flattens each subtree per level
  // (O(depth × size) copying — r1's defect). Instead every node writes
  // into a chunk rope; Set/Map children are encoded into their own ropes,
  // sorted by lexicographic byte comparison ACROSS chunks, and absorbed
  // into the parent by reference. Bytes are materialized exactly once, at
  // the root (or fed straight into the sha256 digest).

  private final class ChunkAcc {
    val parts = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    private var cur = new ByteArrayOutputStream(64)
    /** open small buffer for leaf/header writes */
    def out: ByteArrayOutputStream = cur
    def flush(): Unit = if (cur.size > 0) {
      parts += cur.toByteArray
      cur = new ByteArrayOutputStream(64)
    }
    /** move another rope's chunks in by reference */
    def absorb(o: ChunkAcc): Unit = { flush(); o.flush(); parts ++= o.parts }
    def toArray: Array[Byte] = {
      flush()
      val n = parts.foldLeft(0)(_ + _.length)
      val a = new Array[Byte](n)
      var off = 0
      parts.foreach { p => System.arraycopy(p, 0, a, off, p.length); off += p.length }
      a
    }
    def digestInto(md: MessageDigest): Unit = { flush(); parts.foreach(md.update) }
  }

  /** Unsigned-lexicographic compare of two ropes without flattening. */
  private def compareChunks(a: ChunkAcc, b: ChunkAcc): Int = {
    a.flush(); b.flush()
    var ai = 0; var aj = 0; var bi = 0; var bj = 0
    while (true) {
      while (ai < a.parts.length && aj >= a.parts(ai).length) { ai += 1; aj = 0 }
      while (bi < b.parts.length && bj >= b.parts(bi).length) { bi += 1; bj = 0 }
      val aDone = ai >= a.parts.length
      val bDone = bi >= b.parts.length
      if (aDone || bDone) return java.lang.Boolean.compare(!aDone, !bDone)
      val c = (a.parts(ai)(aj) & 0xff) - (b.parts(bi)(bj) & 0xff)
      if (c != 0) return c
      aj += 1; bj += 1
    }
    0 // unreachable
  }

  private implicit val chunkOrdering: Ordering[ChunkAcc] =
    (a: ChunkAcc, b: ChunkAcc) => compareChunks(a, b)

  private def writeCanonical(v: PoValue, acc: ChunkAcc): Unit = v match {
    case PoArr(items) =>
      writeTypeAndLen(4, items.length.toLong, acc.out)
      items.foreach(writeCanonical(_, acc))
    case s: PoSet =>
      writeTag(258, acc.out)
      writeTypeAndLen(4, s.items.length.toLong, acc.out)
      val kids = s.items.map { i => val a = new ChunkAcc; writeCanonical(i, a); a }
      kids.sorted.foreach(acc.absorb)
    case PoObj(fields) =>
      writeTypeAndLen(5, fields.size.toLong, acc.out)
      fields.toVector.sortBy(_._1).foreach { case (k, fv) =>
        write(PoStr(k), acc.out)
        writeCanonical(fv, acc)
      }
    case m: PoMap =>
      val entries = m.entries
      writeTag(259, acc.out)
      writeTypeAndLen(5, entries.length.toLong, acc.out)
      val kids = entries.map { case (k, mv) =>
        val ka = new ChunkAcc; writeCanonical(k, ka)
        val va = new ChunkAcc; writeCanonical(mv, va)
        (ka, va)
      }
      kids.sortBy(_._1).foreach { case (ka, va) => acc.absorb(ka); acc.absorb(va) }
    case leaf =>
      write(leaf, acc.out)
  }

  /** Insertion-order (storage-form) encoding — order is data, the reduce
    * lattice is order-sensitive. Canonical form goes via writeCanonical. */
  private def write(v: PoValue, out: ByteArrayOutputStream): Unit = v match {
    case PoNull      => out.write(0xf6)
    case PoUndefined => out.write(0xf7)
    case PoBool(b)   => out.write(if (b) 0xf5 else 0xf4)
    case PoInt(n) =>
      if (n >= 0) writeTypeAndLen(0, n, out)
      else writeTypeAndLen(1, -(n + 1), out)
    case PoNum(d) =>
      out.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(d) // canonical NaN via doubleToLongBits
      var i = 56; while (i >= 0) { out.write(((bits >> i) & 0xff).toInt); i -= 8 }
    case PoBigInt(b) =>
      val (tag, mag) = if (b.signum >= 0) (2L, b) else (3L, -(b + 1))
      writeTag(tag, out)
      val bytes0 = mag.toByteArray
      val bytes = if (bytes0.length > 1 && bytes0(0) == 0) bytes0.drop(1) else bytes0
      writeTypeAndLen(2, bytes.length.toLong, out)
      out.write(bytes, 0, bytes.length)
    case PoStr(s) =>
      val b = s.getBytes(UTF_8)
      writeTypeAndLen(3, b.length.toLong, out)
      out.write(b, 0, b.length)
    case b: PoBytes =>
      val arr = b.unsafeBytes
      writeTypeAndLen(2, arr.length.toLong, out)
      out.write(arr, 0, arr.length)
    case PoArr(items) =>
      writeTypeAndLen(4, items.length.toLong, out)
      items.foreach(write(_, out))
    case s: PoSet =>
      writeTag(258, out)
      writeTypeAndLen(4, s.items.length.toLong, out)
      s.items.foreach(write(_, out))
    case PoObj(fields) =>
      writeTypeAndLen(5, fields.size.toLong, out)
      fields.foreach { case (k, fv) => write(PoStr(k), out); write(fv, out) }
    case PoMap(entries) =>
      writeTag(259, out)
      writeTypeAndLen(5, entries.length.toLong, out)
      entries.foreach { case (k, mv) => write(k, out); write(mv, out) }
    case PoDate(ms) =>
      writeTag(1, out)
      if (ms >= 0) writeTypeAndLen(0, ms, out) else writeTypeAndLen(1, -(ms + 1), out)
    case PoURL(u) =>
      writeTag(32, out)
      val b = u.getBytes(UTF_8)
      writeTypeAndLen(3, b.length.toLong, out)
      out.write(b, 0, b.length)
  }

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): PoValue = {
    val in = new Reader(bytes)
    val v = in.readValue()
    v
  }

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    private def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    private def uN(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    private def readLen(info: Int): Long = info match {
      case i if i < 24 => i.toLong
      case 24 => uN(1)
      case 25 => uN(2)
      case 26 => uN(4)
      case 27 => uN(8)
      case other => throw new IllegalArgumentException(s"indefinite/unsupported length info $other")
    }
    private def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }

    def readValue(): PoValue = {
      val ib = u8()
      val major = ib >> 5
      val info = ib & 0x1f
      major match {
        case 0 => PoInt(readLen(info))
        case 1 => PoInt(-(readLen(info) + 1))
        case 2 => PoBytes(take(readLen(info).toInt))
        case 3 => PoStr(new String(take(readLen(info).toInt), UTF_8))
        case 4 =>
          val n = readLen(info).toInt
          PoArr(Vector.fill(n)(readValue()))
        case 5 =>
          val n = readLen(info).toInt
          val b = Vector.newBuilder[(String, PoValue)]
          var i = 0
          while (i < n) {
            val k = readValue() match {
              case PoStr(s) => s
              case other => throw new IllegalArgumentException(s"non-string object key $other")
            }
            b += (k -> readValue()); i += 1
          }
          PoObj(scala.collection.immutable.VectorMap.from(b.result()))
        case 6 =>
          val tag = readLen(info)
          tag match {
            case 1 => // our convention: integer epoch millis
              readValue() match {
                case PoInt(ms) => PoDate(ms)
                case other => throw new IllegalArgumentException(s"bad date payload $other")
              }
            case 2 | 3 =>
              readValue() match {
                case b: PoBytes =>
                  val mag = BigInt(1, b.unsafeBytes)
                  PoBigInt(if (tag == 2) mag else -(mag + 1))
                case other => throw new IllegalArgumentException(s"bad bignum payload $other")
              }
            case 32 =>
              readValue() match {
                case PoStr(s) => PoURL(s)
                case other => throw new IllegalArgumentException(s"bad URL payload $other")
              }
            case 258 =>
              readValue() match {
                case PoArr(items) => PoSet.fromSeq(items)
                case other => throw new IllegalArgumentException(s"bad Set payload $other")
              }
            case 259 =>
              val ib2 = u8()
              require(ib2 >> 5 == 5, s"tag 259 must wrap a map, got major ${ib2 >> 5}")
              val n = readLen(ib2 & 0x1f).toInt
              val b = Vector.newBuilder[(PoValue, PoValue)]
              var i = 0
              while (i < n) { b += (readValue() -> readValue()); i += 1 }
              PoMap(b.result())
            case other => throw new IllegalArgumentException(s"unsupported CBOR tag $other")
          }
        case 7 =>
          info match {
            case 20 => PoBool(false)
            case 21 => PoBool(true)
            case 22 => PoNull
            case 23 => PoUndefined
            case 27 => PoNum(java.lang.Double.longBitsToDouble(uN(8)))
            case other => throw new IllegalArgumentException(s"unsupported simple value $other")
          }
      }
    }
  }
}
