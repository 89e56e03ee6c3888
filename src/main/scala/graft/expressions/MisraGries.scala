package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded Misra–Gries frequent-items sketch over Long keys: at most
  * `k` (key, residual-count) counters at every stage, emitting the
  * surviving KEYS as a sorted array.
  *
  * This is the candidate-generation half of exact two-pass heavy
  * hitters ([[graft.ops.Sketch.heavyHitters]]). The guarantee that
  * makes the second pass EXACT: after arbitrary partitioning and
  * merging, every item whose true frequency exceeds n/(k+1) (n = total
  * non-null rows) still holds a counter — the classic Misra–Gries
  * bound, preserved under the counter-offset merge of Agarwal et al.,
  * "Mergeable Summaries" (PODS'12, §3.1). Items BELOW the bound may or
  * may not survive, and residual counts are order-dependent, so this
  * aggregate deliberately emits only the key set (deterministic up to
  * a superset guarantee) and the exact pass re-counts.
  *
  * Why a custom `TypedImperativeAggregate`: every declarative spelling
  * of "candidate frequent keys" is unbounded somewhere — a plain
  * `groupBy(key).count` shuffles one row per DISTINCT key (vocabulary-
  * cardinality at 100 TB), and `collect_list` buffers whole partitions.
  * This buffer holds at most k counters map-side, so the exchange
  * carries ≤ k (long, long) pairs per partition — the same discipline
  * as [[KMinDistinct]], for frequency instead of order statistics.
  *
  * Update is the textbook rule (hit → increment; room → insert; full →
  * global decrement, dropping zeros). The O(k) decrement amortizes:
  * each triggering row removes ≥ 1 total count, and every row adds
  * exactly 1, so total decrement work is O(rows). Merge adds counts
  * pointwise, then if more than k counters survive, subtracts the
  * (k+1)-th largest count from all and drops the non-positive — the
  * offset step that keeps the merged error additive.
  *
  * Null inputs are skipped (SQL aggregate convention); an all-null /
  * empty group yields an empty array, never null.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  // buffer values are EXPLICITLY boxed java.lang.Long: with scala.Long
  // type parameters, `get` on a missing key silently unboxes null to 0
  // and a `!= null` test is always true — the decrement branch would
  // never fire and the buffer would grow unboundedly
  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = b.get(key)
      if (cur != null) { b.put(key, java.lang.Long.valueOf(cur.longValue + 1L)); () }
      else if (b.size < k) { b.put(key, java.lang.Long.valueOf(1L)); () }
      else {
        // full and unseen: decrement every counter, drop zeros (the
        // arriving item is implicitly decremented away with them)
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue == 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - 1L))
        }
      }
    }
    b
  }

  override def merge(b: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b.get(e.getKey)
      b.put(e.getKey, if (cur == null) e.getValue
        else java.lang.Long.valueOf(cur.longValue + e.getValue.longValue))
    }
    if (b.size > k) {
      // offset step: subtract the (k+1)-th largest count from all
      val counts = new Array[Long](b.size)
      var i = 0
      val cit = b.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next().longValue; i += 1 }
      java.util.Arrays.sort(counts)
      val offset = counts(counts.length - (k + 1)) // (k+1)-th largest
      val eit = b.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue.longValue <= offset) eit.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - offset))
      }
    }
    b
  }

  override def eval(b: Buf): Any = {
    val out = new Array[Long](b.size)
    var i = 0
    val it = b.keySet().iterator()
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    java.util.Arrays.sort(out) // deterministic emission order
    new GenericArrayData(out)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue); bb.putLong(e.getValue.longValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new Buf(n * 2)
    var i = 0
    while (i < n) {
      b.put(java.lang.Long.valueOf(bb.getLong), java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    b
  }

  // LongType requirement enforced by the caller (Sketch.hash60) — see
  // the KMinDistinct note on private[sql] AbstractDataType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
