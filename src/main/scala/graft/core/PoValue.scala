package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.immutable.VectorMap

/** The engine's document value type — the union a CBOR / structured-clone
  * document can hold, mirroring the reference's logical type system
  * (reference: library/models/codec/json.js:26-86 replacer/reviver and the
  * codec corpus test/test-models-codec.js:20-52).
  *
  * Values are schemaless: one collection can hold a number, a byte string
  * and an object side by side (reference: test/test-models-dataset.js:66-78).
  * Physically a value travels through Spark as its canonical CBOR bytes in
  * a BinaryType column (one column, any shape, no schema merge problems at
  * 100 TB); executors decode to this ADT only inside typed operators.
  */
sealed trait PoValue extends Serializable {
  /** type-detect equivalence class used by the reduce lattice
    * (reference: library/utility/reduce.js:13-18). */
  def typeName: String = this match {
    case PoNull       => "null"
    case PoUndefined  => "undefined"
    case _: PoBool    => "boolean"
    case _: PoInt     => "number"
    case _: PoNum     => "number"
    case _: PoBigInt  => "bigint"
    case _: PoStr     => "string"
    case _: PoBytes   => "bytes"
    case _: PoArr     => "array"
    case _: PoSet     => "set"
    case _: PoObj     => "object"
    case _: PoMap     => "map"
    case _: PoDate    => "date"
    case _: PoURL     => "url"
  }
}

/** JSON/CBOR null. */
case object PoNull extends PoValue
/** JS `undefined` — distinct from null; as a record value it is a delete
  * tombstone (reference: docs/api/datasets.md:46). */
case object PoUndefined extends PoValue
final case class PoBool(b: Boolean) extends PoValue
/** Integer fast path (reference numbers are JS doubles; we keep exact
  * integers exact). */
final case class PoInt(v: Long) extends PoValue
/** Floating number incl. NaN / ±Infinity (reference: codec/json.js:29-37). */
final case class PoNum(v: Double) extends PoValue
final case class PoBigInt(v: BigInt) extends PoValue
final case class PoStr(s: String) extends PoValue
/** Byte string. Wraps an immutable copy; equality is by content. */
final class PoBytes private (private val arr: Array[Byte]) extends PoValue {
  def bytes: Array[Byte] = arr.clone()
  /** zero-copy view for codecs — callers must not mutate */
  private[graft] def unsafeBytes: Array[Byte] = arr
  def length: Int = arr.length
  override def equals(o: Any): Boolean = o match {
    case b: PoBytes => java.util.Arrays.equals(arr, b.arr)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(arr)
  override def toString: String = s"PoBytes(${arr.length} bytes)"
}
object PoBytes {
  def apply(b: Array[Byte]): PoBytes = new PoBytes(b.clone())
  def fromString(s: String): PoBytes = new PoBytes(s.getBytes(UTF_8))
}
/** Heterogeneous array. */
final case class PoArr(items: Vector[PoValue]) extends PoValue
/** Insertion-ordered set (JS Set). Construction dedups.
  *
  * Backed by an insertion-order Vector plus an immutable HashSet index so
  * membership is O(1) and `union` is O(|right|) with structural sharing —
  * the lens reduce folds one set per posting, so a hot key at 100 TB
  * unions millions of members and anything quadratic is a scale-killer
  * (this replaces the O(n·m) `filterNot(items.contains)` of r1).
  */
final class PoSet private (val items: Vector[PoValue],
                           private val index: Set[PoValue]) extends PoValue {
  def contains(v: PoValue): Boolean = index.contains(v)
  def size: Int = items.length
  /** Set union preserving left-then-right insertion order
    * (reference: library/utility/reduce.js:21-23). */
  def union(other: PoSet): PoSet = {
    val fresh = other.items.filterNot(index.contains)
    if (fresh.isEmpty) this
    else new PoSet(items ++ fresh, index ++ fresh)
  }
  override def equals(o: Any): Boolean = o match {
    case s: PoSet => index == s.index
    case _ => false
  }
  override def hashCode: Int = index.hashCode
  override def toString: String = items.mkString("PoSet(", ", ", ")")
}
object PoSet {
  def apply(vs: PoValue*): PoSet = fromSeq(vs)
  def fromSeq(vs: Seq[PoValue]): PoSet = {
    val b = Vector.newBuilder[PoValue]
    var seen = Set.empty[PoValue]
    vs.foreach { v =>
      if (!seen.contains(v)) { seen += v; b += v }
    }
    new PoSet(b.result(), seen)
  }
}
/** String-keyed object with stable own-key insertion order. */
final case class PoObj(fields: VectorMap[String, PoValue]) extends PoValue
object PoObj {
  def apply(kvs: (String, PoValue)*): PoObj = PoObj(VectorMap(kvs: _*))
  val empty: PoObj = PoObj(VectorMap.empty[String, PoValue])
}
/** Arbitrary-key map (JS Map; CBOR tag 259). Insertion-ordered; keys
  * unique. Backed by an insertion-order key Vector plus an immutable
  * HashMap so `get`/`updated` are O(1) (amortized) with structural
  * sharing — recursive map merges in the reduce lattice touch every key
  * of the right side and were quadratic with linear scans (r1). */
final class PoMap private (private val keys: Vector[PoValue],
                           private val byKey: Map[PoValue, PoValue]) extends PoValue {
  def entries: Vector[(PoValue, PoValue)] = keys.map(k => (k, byKey(k)))
  def get(k: PoValue): Option[PoValue] = byKey.get(k)
  def size: Int = keys.length
  /** Replace in place if the key exists (keeps its insertion position),
    * append otherwise — JS Map.set semantics. */
  def updated(k: PoValue, v: PoValue): PoMap =
    if (byKey.contains(k)) new PoMap(keys, byKey.updated(k, v))
    else new PoMap(keys :+ k, byKey.updated(k, v))
  /** Map-style structural equality: key ORDER is presentation, not
    * identity (PoObj's VectorMap equality is likewise unordered, and the
    * canonical hash sorts entries) — so equality, set membership and the
    * content hash all agree on what "the same map" means. */
  override def equals(o: Any): Boolean = o match {
    case m: PoMap => byKey == m.byKey
    case _ => false
  }
  override def hashCode: Int = byKey.hashCode
  override def toString: String = entries.mkString("PoMap(", ", ", ")")
}
object PoMap {
  val empty: PoMap = new PoMap(Vector.empty, Map.empty)
  /** Build from entry pairs; a repeated key updates in place (JS Map). */
  def apply(entries: Vector[(PoValue, PoValue)]): PoMap =
    entries.foldLeft(empty)((m, kv) => m.updated(kv._1, kv._2))
  def unapply(m: PoMap): Some[Vector[(PoValue, PoValue)]] = Some(m.entries)
  def of(kvs: (PoValue, PoValue)*): PoMap = apply(kvs.toVector)
}
/** JS Date, millisecond precision. */
final case class PoDate(epochMillis: Long) extends PoValue
/** JS URL (kept as its string form; CBOR tag 32). */
final case class PoURL(url: String) extends PoValue

object PoValue {
  /** Convenience constructors from plain Scala values (tests, map fns). */
  def of(x: Any): PoValue = x match {
    case null            => PoNull
    case v: PoValue      => v
    case b: Boolean      => PoBool(b)
    case i: Int          => PoInt(i.toLong)
    case l: Long         => PoInt(l)
    case d: Double       => PoNum(d)
    case f: Float        => PoNum(f.toDouble)
    case b: BigInt       => PoBigInt(b)
    case s: String       => PoStr(s)
    case b: Array[Byte]  => PoBytes(b)
    case m: VectorMap[_, _] => PoObj(m.asInstanceOf[VectorMap[String, Any]].map { case (k, v) => k -> of(v) })
    case m: Map[_, _]    => PoObj(VectorMap.from(m.asInstanceOf[Map[String, Any]].toSeq.map { case (k, v) => k -> of(v) }))
    case s: Seq[_]       => PoArr(s.map(of).toVector)
    case other => throw new IllegalArgumentException(s"cannot lift $other")
  }
}
