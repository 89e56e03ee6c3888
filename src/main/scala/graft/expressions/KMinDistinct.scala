package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values aggregate: the k smallest DISTINCT Long
  * values of the child column, as a sorted array.
  *
  * This is the aggregate the KMV cardinality sketch
  * ([[graft.ops.Sketch]]) needs PER GROUP, and the reason it must be a
  * custom `TypedImperativeAggregate` rather than composed built-ins:
  * every declarative spelling is unbounded somewhere —
  * `collect_set` buffers the group's whole distinct set (group-sized
  * memory, group-sized shuffle rows), and a `row_number` window first
  * sorts every distinct hash of every group (the global-sort shape
  * `orderBy(h).limit(k)` avoids for the single-group case via
  * TakeOrderedAndProject). This buffer holds AT MOST k longs per
  * group at every stage: partial aggregation trims map-side, so only
  * k values per group per partition ever reach the exchange, and
  * merges stay k-bounded. That is the TakeOrdered guarantee, moved
  * inside the aggregation operator where a GROUP BY can use it.
  *
  * Distinctness is inherent (the buffer is a set), so callers do NOT
  * pre-`distinct()` the input — the whole point is that no
  * group-sized structure exists anywhere.
  *
  * Buffer: `java.util.TreeSet` — k is sketch-sized (tens to a few
  * thousand), so the tree's pointer overhead is irrelevant next to
  * the shuffle rows it avoids; `last()` gives the current k-th min
  * for the O(1) reject test that dominates once the buffer is warm
  * (a random value beats the k-th min with probability ~k/n).
  *
  * Null inputs are skipped (SQL aggregate convention); an all-null /
  * empty group yields an empty array, never null.
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k_min_distinct needs k >= 1, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(b: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (b.size < k) { b.add(v); () }
    // strictly-less test first: equal to the current k-th min means
    // already present (set) — skip the log(k) insert entirely
    else if (v < b.last() && b.add(v)) { b.pollLast(); () }
  }

  override def update(
      b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[Long])
    b
  }

  override def merge(
      b: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    // other is ascending: once a value fails the k-th-min test every
    // later one will too — bail out instead of scanning the rest
    var go = true
    while (go && it.hasNext) {
      val v = it.next().longValue()
      if (b.size < k || v < b.last()) add(b, v) else go = false
    }
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    var i = 0
    val it = b.iterator()
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  // no ExpectsInputTypes mixin: `AbstractDataType` is private[sql] in
  // Spark 4, so an extension library can't spell the override — the
  // LongType requirement is enforced by the caller (Sketch.hash60)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "k_min_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinDistinct =
    copy(child = newChild)
}
