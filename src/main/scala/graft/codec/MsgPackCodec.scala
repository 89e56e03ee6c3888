package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.immutable.VectorMap

import graft.core._

/** MessagePack codec (reference: library/models/codec/msgpack.js, which
  * wraps msgpack5). Faithful behaviors:
  *  - `undefined` travels as the `{type:'constant', data:'undefined'}`
  *    map wrapper, and real two-key `{type, data}` objects are escaped
  *    with a `!` prefix on encode / unescaped on decode
  *    (msgpack.js:8-27 replacer, :29-48 reviver);
  *  - Set uses the msgpack extension mechanism with the reference's
  *    name-hash id scheme (`nameToExtID('set')` == 72, msgpack.js:64-72),
  *    payload = msgpack array of members;
  *  - Date uses the standard msgpack timestamp extension (-1).
  * Engine extensions beyond the reference (which drops these types):
  * Map/bigint/url get their own nameToExtID codes so the full engine
  * type system round-trips.
  */
object MsgPackCodec extends Codec {
  val handles: Seq[String] = Seq("application/msgpack", "application/x-msgpack")
  val extensions: Seq[String] = Seq("msgpack")

  /** reference msgpack.js:63-66 — extension id from a type name */
  def nameToExtID(name: String): Int =
    1 + name.map(c => Integer.parseInt(c.toString, 36)).sum % 127

  val SetExt: Int = nameToExtID("set")       // 72, same as the reference
  val MapExt: Int = nameToExtID("map")
  val BigIntExt: Int = nameToExtID("bigint")
  val UrlExt: Int = nameToExtID("url")

  // ---------------------------------------------------------------- encode

  def encode(v: PoValue): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    write(v, out)
    out.toByteArray
  }

  private def u8(out: ByteArrayOutputStream, b: Int): Unit = out.write(b & 0xff)
  private def uN(out: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = (n - 1) * 8
    while (i >= 0) { out.write(((v >> i) & 0xff).toInt); i -= 8 }
  }

  private def writeStr(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    if (b.length < 32) u8(out, 0xa0 | b.length)
    else if (b.length < 256) { u8(out, 0xd9); u8(out, b.length) }
    else if (b.length < 65536) { u8(out, 0xda); uN(out, b.length, 2) }
    else { u8(out, 0xdb); uN(out, b.length, 4) }
    out.write(b, 0, b.length)
  }

  private def writeExt(out: ByteArrayOutputStream, ext: Int, payload: Array[Byte]): Unit = {
    payload.length match {
      case 1 => u8(out, 0xd4)
      case 2 => u8(out, 0xd5)
      case 4 => u8(out, 0xd6)
      case 8 => u8(out, 0xd7)
      case 16 => u8(out, 0xd8)
      case n if n < 256 => u8(out, 0xc7); u8(out, n)
      case n if n < 65536 => u8(out, 0xc8); uN(out, n, 2)
      case n => u8(out, 0xc9); uN(out, n, 4)
    }
    u8(out, ext)
    out.write(payload, 0, payload.length)
  }

  private def writeMapHeader(out: ByteArrayOutputStream, n: Int): Unit =
    if (n < 16) u8(out, 0x80 | n)
    else if (n < 65536) { u8(out, 0xde); uN(out, n, 2) }
    else { u8(out, 0xdf); uN(out, n, 4) }

  private def write(v: PoValue, out: ByteArrayOutputStream): Unit = v match {
    case PoNull => u8(out, 0xc0)
    case PoUndefined =>
      // {type:'constant', data:'undefined'} wrapper (msgpack.js:8-10)
      writeMapHeader(out, 2)
      writeStr(out, "type"); writeStr(out, "constant")
      writeStr(out, "data"); writeStr(out, "undefined")
    case PoBool(b) => u8(out, if (b) 0xc3 else 0xc2)
    case PoInt(n) =>
      if (n >= 0 && n < 128) u8(out, n.toInt)
      else if (n < 0 && n >= -32) u8(out, 0xe0 | (n + 32).toInt)
      else if (n >= Byte.MinValue && n <= Byte.MaxValue) { u8(out, 0xd0); u8(out, n.toInt) }
      else if (n >= Short.MinValue && n <= Short.MaxValue) { u8(out, 0xd1); uN(out, n, 2) }
      else if (n >= Int.MinValue && n <= Int.MaxValue) { u8(out, 0xd2); uN(out, n, 4) }
      else { u8(out, 0xd3); uN(out, n, 8) }
    case PoNum(d) =>
      u8(out, 0xcb); uN(out, java.lang.Double.doubleToLongBits(d), 8)
    case PoBigInt(b) => writeExt(out, BigIntExt, b.toByteArray)
    case PoStr(s) => writeStr(out, s)
    case b: PoBytes =>
      val arr = b.unsafeBytes
      if (arr.length < 256) { u8(out, 0xc4); u8(out, arr.length) }
      else if (arr.length < 65536) { u8(out, 0xc5); uN(out, arr.length, 2) }
      else { u8(out, 0xc6); uN(out, arr.length, 4) }
      out.write(arr, 0, arr.length)
    case PoArr(items) =>
      if (items.length < 16) u8(out, 0x90 | items.length)
      else if (items.length < 65536) { u8(out, 0xdc); uN(out, items.length, 2) }
      else { u8(out, 0xdd); uN(out, items.length, 4) }
      items.foreach(write(_, out))
    case s: PoSet =>
      // ext payload = msgpack array of members (msgpack.js:69-72)
      writeExt(out, SetExt, encode(PoArr(s.items)))
    case m: PoMap =>
      writeExt(out, MapExt, encode(PoArr(m.entries.flatMap(e => Vector(e._1, e._2)))))
    case PoObj(fields) =>
      // escape real {type,data} objects with '!' (msgpack.js:19-21)
      val fs =
        if (fields.size == 2 && fields.contains("type") && fields.contains("data"))
          fields.get("type") match {
            case Some(PoStr(t)) => fields.updated("type", PoStr("!" + t))
            case _ => fields
          }
        else fields
      writeMapHeader(out, fs.size)
      fs.foreach { case (k, fv) => writeStr(out, k); write(fv, out) }
    case PoDate(ms) =>
      // msgpack timestamp ext (-1): timestamp64 for non-negative, 96 else
      val secs = Math.floorDiv(ms, 1000L)
      val nanos = Math.floorMod(ms, 1000L) * 1000000L
      if (secs >= 0 && secs < (1L << 34)) {
        writeExt(out, -1 & 0xff, {
          val b = new ByteArrayOutputStream(8)
          uN(b, (nanos << 34) | secs, 8)
          b.toByteArray
        })
      } else {
        val b = new ByteArrayOutputStream(12)
        uN(b, nanos, 4); uN(b, secs, 8)
        writeExt(out, -1 & 0xff, b.toByteArray)
      }
    case PoURL(u) => writeExt(out, UrlExt, u.getBytes(UTF_8))
  }

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): PoValue = new Reader(bytes).read()

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    private def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    private def uN(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    private def sN(n: Int): Long = {
      val raw = uN(n)
      val shift = 64 - n * 8
      (raw << shift) >> shift
    }
    private def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    private def str(n: Int): String = new String(take(n), UTF_8)

    def read(): PoValue = {
      val b = u8()
      b match {
        case x if x < 0x80 => PoInt(x.toLong)                       // pos fixint
        case x if x >= 0xe0 => PoInt((x - 256).toLong)              // neg fixint
        case x if (x & 0xf0) == 0x80 => readMap(x & 0x0f)           // fixmap
        case x if (x & 0xf0) == 0x90 => readArr(x & 0x0f)           // fixarray
        case x if (x & 0xe0) == 0xa0 => PoStr(str(x & 0x1f))        // fixstr
        case 0xc0 => PoNull
        case 0xc2 => PoBool(false)
        case 0xc3 => PoBool(true)
        case 0xc4 => PoBytes(take(u8()))
        case 0xc5 => PoBytes(take(uN(2).toInt))
        case 0xc6 => PoBytes(take(uN(4).toInt))
        case 0xc7 => { val n = u8(); ext(sN(1).toInt, take(n)) }
        case 0xc8 => { val n = uN(2).toInt; ext(sN(1).toInt, take(n)) }
        case 0xc9 => { val n = uN(4).toInt; ext(sN(1).toInt, take(n)) }
        case 0xca => PoNum(java.lang.Float.intBitsToFloat(uN(4).toInt).toDouble)
        case 0xcb => PoNum(java.lang.Double.longBitsToDouble(uN(8)))
        case 0xcc => PoInt(uN(1))
        case 0xcd => PoInt(uN(2))
        case 0xce => PoInt(uN(4))
        case 0xcf => PoInt(uN(8)) // may wrap for >2^63; acceptable
        case 0xd0 => PoInt(sN(1))
        case 0xd1 => PoInt(sN(2))
        case 0xd2 => PoInt(sN(4))
        case 0xd3 => PoInt(sN(8))
        case 0xd4 => ext(sN(1).toInt, take(1))
        case 0xd5 => ext(sN(1).toInt, take(2))
        case 0xd6 => ext(sN(1).toInt, take(4))
        case 0xd7 => ext(sN(1).toInt, take(8))
        case 0xd8 => ext(sN(1).toInt, take(16))
        case 0xd9 => PoStr(str(u8()))
        case 0xda => PoStr(str(uN(2).toInt))
        case 0xdb => PoStr(str(uN(4).toInt))
        case 0xdc => readArr(uN(2).toInt)
        case 0xdd => readArr(uN(4).toInt)
        case 0xde => readMap(uN(2).toInt)
        case 0xdf => readMap(uN(4).toInt)
        case other => throw new IllegalArgumentException(f"bad msgpack byte 0x$other%02x")
      }
    }

    private def readArr(n: Int): PoValue =
      PoArr(Vector.fill(n)(read()))

    private def readMap(n: Int): PoValue = {
      val entries = Vector.fill(n)((read(), read()))
      if (entries.forall(_._1.isInstanceOf[PoStr])) {
        val fields = VectorMap.from(entries.map { case (PoStr(k), v) => k -> v
          case _ => throw new IllegalStateException("unreachable") })
        // reviver (msgpack.js:29-36): constant-undefined unwraps, '!' unescapes
        if (fields.size == 2) {
          (fields.get("type"), fields.get("data")) match {
            case (Some(PoStr("constant")), Some(PoStr("undefined"))) => PoUndefined
            case (Some(PoStr(t)), Some(_)) if t.startsWith("!") =>
              PoObj(fields.updated("type", PoStr(t.drop(1))))
            case _ => PoObj(fields)
          }
        } else PoObj(fields)
      } else PoMap(entries)
    }

    private def ext(id: Int, payload: Array[Byte]): PoValue = id match {
      case x if x == SetExt =>
        PoSet.fromSeq(decode(payload).asInstanceOf[PoArr].items)
      case x if x == MapExt =>
        val flat = decode(payload).asInstanceOf[PoArr].items
        PoMap(flat.grouped(2).map(p => (p(0), p(1))).toVector)
      case x if x == BigIntExt => PoBigInt(BigInt(payload))
      case x if x == UrlExt => PoURL(new String(payload, UTF_8))
      case -1 =>
        payload.length match {
          case 4 => PoDate(BigInt(1, payload).toLong * 1000L)
          case 8 =>
            val v = BigInt(1, payload).toLong
            val nanos = v >>> 34
            val secs = v & ((1L << 34) - 1)
            PoDate(secs * 1000L + nanos / 1000000L)
          case 12 =>
            val nanos = BigInt(1, payload.take(4)).toLong
            val secs = BigInt(payload.drop(4)).toLong
            PoDate(secs * 1000L + nanos / 1000000L)
          case n => throw new IllegalArgumentException(s"bad timestamp ext length $n")
        }
      case other => throw new IllegalArgumentException(s"unknown msgpack ext $other")
    }
  }
}

/** JS-literal codec, output only (reference:
  * library/models/codec/javascript.js wrapping javascript-stringify) —
  * renders values as readable JavaScript source. */
object JsCodec {
  val handles: Seq[String] = Seq("text/javascript", "application/javascript")
  val extensions: Seq[String] = Seq("js", "javascript")

  private val Ident = "^[A-Za-z_$][A-Za-z0-9_$]*$".r

  def encodeString(v: PoValue): String = v match {
    case PoNull => "null"
    case PoUndefined => "undefined"
    case PoBool(b) => b.toString
    case PoInt(n) => n.toString
    case PoNum(d) =>
      if (d.isNaN) "NaN"
      else if (d == Double.PositiveInfinity) "Infinity"
      else if (d == Double.NegativeInfinity) "-Infinity"
      else if (d == Math.rint(d) && math.abs(d) < 1e15) s"${d.toLong}"
      else d.toString
    case PoBigInt(b) => s"${b}n"
    case PoStr(s) => quote(s)
    case b: PoBytes =>
      s"Buffer.from('${java.util.Base64.getEncoder.encodeToString(b.unsafeBytes)}', 'base64')"
    case PoArr(items) => items.map(encodeString).mkString("[", ",", "]")
    case s: PoSet =>
      s"new Set(${encodeString(PoArr(s.items))})"
    case m: PoMap =>
      s"new Map(${encodeString(PoArr(m.entries.map(e => PoArr(Vector(e._1, e._2)))))})"
    case PoObj(fields) =>
      fields.map { case (k, fv) =>
        val key = if (Ident.matches(k)) k else quote(k)
        s"$key:${encodeString(fv)}"
      }.mkString("{", ",", "}")
    case PoDate(ms) => s"new Date($ms)"
    case PoURL(u) => s"new URL(${quote(u)})"
  }

  private def quote(s: String): String =
    "'" + s.flatMap {
      case '\'' => "\\'"
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "'"
}
