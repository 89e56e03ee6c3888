package graft.codec

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._

import graft.core._

/** JSON codec with the reference's `{type, data}` wrapper forms for the
  * values plain JSON can't carry (reference: library/models/codec/json.js
  * — replacer :26-49, reviver :66-89):
  *
  *   Buffer → `{type:'Buffer', data:[bytes]}` (Node Buffer JSON form)
  *   Set    → `{type:'Set',  data:[...]}`
  *   Map    → `{type:'Map',  data:[[k,v],...]}`
  *   Date   → `{type:'Date', data: epochMillis}`
  *   URL    → `{type:'URL',  data: string}`
  *   BigInt → `{type:'BigInteger', data: string}`
  *   undefined/NaN/±Infinity → `{type:'constant', data:'undefined'|'NaN'|
  *                              'infinity'|'-infinity'}`
  *
  * The reviver unwraps any object with exactly the two keys `type` and
  * `data` whose shape matches — the same (documented) ambiguity as the
  * reference: real data of that exact shape round-trips as the wrapped
  * type.
  *
  * Number handling: JSON number without '.'/'e' that fits a Long decodes
  * to the integer fast path; otherwise double. Integral doubles encode
  * with a ".0" so PoNum/PoInt round-trip — the reference has a single JS
  * number type, so this distinction is invisible to it.
  */
object JsonCodec extends Codec {
  val handles: Seq[String] = Seq("application/json", "text/json")
  val extensions: Seq[String] = Seq("json")

  private val mapper = new ObjectMapper()

  /** JSON5-ish fallback parser (reference json.js:58-64 falls back to
    * json5.parse): unquoted/single-quoted field names, single-quoted
    * strings, comments, trailing commas. */
  private val lenient: ObjectMapper = {
    import com.fasterxml.jackson.core.json.JsonReadFeature._
    val m = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .enable(ALLOW_UNQUOTED_FIELD_NAMES, ALLOW_SINGLE_QUOTES,
        ALLOW_JAVA_COMMENTS, ALLOW_TRAILING_COMMA,
        ALLOW_NON_NUMERIC_NUMBERS, ALLOW_LEADING_PLUS_SIGN_FOR_NUMBERS)
      .build()
    m
  }

  def encode(v: PoValue): Array[Byte] = encodeString(v).getBytes(UTF_8)
  def decode(bytes: Array[Byte]): PoValue = decodeString(new String(bytes, UTF_8))

  def encodeString(v: PoValue): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  def decodeString(s: String): PoValue =
    try revive(mapper.readTree(s))
    catch {
      case strict: Exception =>
        try revive(lenient.readTree(s))
        catch { case _: Exception => throw strict }
    }

  /** Pretty output (reference json.js print — 2-space indent). */
  def print(v: PoValue, indent: Int = 2): String = {
    val node = mapper.readTree(encodeString(v))
    val pp = new com.fasterxml.jackson.core.util.DefaultPrettyPrinter()
    mapper.writer(pp).writeValueAsString(node)
  }

  // ------------------------------------------------------------- encode

  private def write(v: PoValue, sb: StringBuilder): Unit = v match {
    case PoNull => sb.append("null")
    case PoUndefined => sb.append("""{"type":"constant","data":"undefined"}""")
    case PoBool(b) => sb.append(if (b) "true" else "false")
    case PoInt(n) => sb.append(n)
    case PoNum(d) =>
      if (d.isNaN) sb.append("""{"type":"constant","data":"NaN"}""")
      else if (d == Double.PositiveInfinity) sb.append("""{"type":"constant","data":"infinity"}""")
      else if (d == Double.NegativeInfinity) sb.append("""{"type":"constant","data":"-infinity"}""")
      else if (d == Math.rint(d) && math.abs(d) < 1e15) sb.append(d.toLong).append(".0")
      else sb.append(d)
    case PoBigInt(b) => sb.append("""{"type":"BigInteger","data":"""").append(b).append("\"}")
    case PoStr(s) => writeString(s, sb)
    case b: PoBytes =>
      sb.append("""{"type":"Buffer","data":[""")
      val arr = b.unsafeBytes
      var i = 0
      while (i < arr.length) {
        if (i > 0) sb.append(',')
        sb.append(arr(i) & 0xff)
        i += 1
      }
      sb.append("]}")
    case PoArr(items) =>
      sb.append('[')
      items.zipWithIndex.foreach { case (x, i) =>
        if (i > 0) sb.append(','); write(x, sb)
      }
      sb.append(']')
    case s: PoSet =>
      sb.append("""{"type":"Set","data":[""")
      s.items.zipWithIndex.foreach { case (x, i) =>
        if (i > 0) sb.append(','); write(x, sb)
      }
      sb.append("]}")
    case PoObj(fields) =>
      sb.append('{')
      fields.zipWithIndex.foreach { case ((k, fv), i) =>
        if (i > 0) sb.append(',')
        writeString(k, sb); sb.append(':'); write(fv, sb)
      }
      sb.append('}')
    case m: PoMap =>
      sb.append("""{"type":"Map","data":[""")
      m.entries.zipWithIndex.foreach { case ((k, mv), i) =>
        if (i > 0) sb.append(',')
        sb.append('['); write(k, sb); sb.append(','); write(mv, sb); sb.append(']')
      }
      sb.append("]}")
    case PoDate(ms) => sb.append("""{"type":"Date","data":""").append(ms).append('}')
    case PoURL(u) =>
      sb.append("""{"type":"URL","data":"""); writeString(u, sb); sb.append('}')
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ------------------------------------------------------------- decode

  private[codec] def revive(n: JsonNode): PoValue = n match {
    case _: NullNode | _: MissingNode => PoNull
    case b: BooleanNode => PoBool(b.booleanValue)
    case num: NumericNode =>
      if (num.isIntegralNumber && num.canConvertToLong) {
        // "2.0" parses as DoubleNode (non-integral check below catches it)
        num match {
          case _: DoubleNode | _: FloatNode | _: DecimalNode => PoNum(num.doubleValue)
          case _ => PoInt(num.longValue)
        }
      } else if (num.isIntegralNumber) PoBigInt(BigInt(num.bigIntegerValue))
      else PoNum(num.doubleValue)
    case t: TextNode => PoStr(t.textValue)
    case a: ArrayNode =>
      val b = Vector.newBuilder[PoValue]
      a.forEach(x => b += revive(x))
      PoArr(b.result())
    case o: ObjectNode =>
      unwrap(o).getOrElse {
        var fields = scala.collection.immutable.VectorMap.empty[String, PoValue]
        o.properties().forEach { e =>
          fields = fields.updated(e.getKey, revive(e.getValue))
        }
        PoObj(fields)
      }
    case other => throw new IllegalArgumentException(s"unexpected JSON node $other")
  }

  /** reviver: objects with exactly the keys {type, data} in a known
    * shape unwrap to the richer type (reference json.js:66-89). */
  private def unwrap(o: ObjectNode): Option[PoValue] = {
    if (o.size != 2 || !o.has("type") || !o.has("data")) return None
    val t = o.get("type")
    val d = o.get("data")
    if (!t.isTextual) return None
    t.textValue match {
      case "Buffer" if d.isArray =>
        val arr = new Array[Byte](d.size)
        var ok = true
        var i = 0
        d.forEach { x =>
          if (!x.isIntegralNumber || x.intValue < 0 || x.intValue > 255) ok = false
          else if (i < arr.length) arr(i) = x.intValue.toByte
          i += 1
        }
        if (ok) Some(PoBytes(arr)) else None
      case "Set" if d.isArray =>
        val b = Vector.newBuilder[PoValue]
        d.forEach(x => b += revive(x))
        Some(PoSet.fromSeq(b.result()))
      case "Map" if d.isArray =>
        val b = Vector.newBuilder[(PoValue, PoValue)]
        var ok = true
        d.forEach { pair =>
          if (!pair.isArray || pair.size != 2) ok = false
          else b += (revive(pair.get(0)) -> revive(pair.get(1)))
        }
        if (ok) Some(PoMap(b.result())) else None
      case "Date" if d.isNumber => Some(PoDate(d.longValue))
      case "URL" if d.isTextual => Some(PoURL(d.textValue))
      case "BigInteger" if d.isTextual =>
        try Some(PoBigInt(BigInt(d.textValue))) catch { case _: NumberFormatException => None }
      case "constant" if d.isTextual =>
        d.textValue match {
          case "undefined" => Some(PoUndefined)
          case "NaN" => Some(PoNum(Double.NaN))
          case "infinity" => Some(PoNum(Double.PositiveInfinity))
          case "-infinity" => Some(PoNum(Double.NegativeInfinity))
          case _ => None
        }
      case _ => None
    }
  }
}

/** JSON-Lines: one JSON document per line (reference:
  * library/models/codec/json-lines.js). `encode` of a top-level array
  * emits one line per element; decode returns the array of parsed
  * lines. */
object JsonLinesCodec extends Codec {
  val handles: Seq[String] = Seq("application/jsonlines", "application/ndjson")
  val extensions: Seq[String] = Seq("jsonl")

  def encode(v: PoValue): Array[Byte] = {
    val sb = new StringBuilder
    v match {
      case PoArr(items) => items.foreach(x => sb.append(JsonCodec.encodeString(x)).append('\n'))
      case other => sb.append(JsonCodec.encodeString(other)).append('\n')
    }
    sb.toString.getBytes(UTF_8)
  }

  def decode(bytes: Array[Byte]): PoValue = {
    val lines = new String(bytes, UTF_8).split('\n').map(_.trim).filter(_.nonEmpty)
    PoArr(lines.map(JsonCodec.decodeString).toVector)
  }

  def encodeLine(v: PoValue): String = JsonCodec.encodeString(v)
  def decodeLine(s: String): PoValue = JsonCodec.decodeString(s)
}
