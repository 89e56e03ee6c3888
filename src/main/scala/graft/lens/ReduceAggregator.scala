package graft.lens

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.{Cbor, PoValue, Reduce}

/** Marker: a map function whose emitted values merge commutatively under
  * the reduce lattice — per output key, emissions must be TYPE-CONSISTENT
  * and drawn from the commutative branches (numbers sum, Sets union,
  * dates max, objects/maps of those; mixed types are last-wins by spec
  * and need the ordered path). ReducePropertySpec proves the fragment is
  * commutative + associative at equality level with an order-independent
  * canonical hash. Declaring it switches the lens build from the ordered
  * single-shuffle fold to a partial-aggregating shuffle.
  *
  * Scale rationale: the ordered fold must move EVERY emitted pair to the
  * reducer for its key — for an inverted index at 100 TB that is one
  * singleton Set per (token, doc) occurrence. With partial aggregation
  * the map side combines within each partition first, so shuffle volume
  * drops from O(emitted pairs) to O(distinct keys × partitions) — the
  * same distinction as sum() vs collect-then-add. Only sound when order
  * cannot matter (last-wins and array-concat branches are NOT
  * commutative; keep such lenses on the default path).
  */
trait CommutativeMapFn extends MapFn

/** Typed partial aggregator over the merge lattice: buffers hold decoded
  * [[PoValue]]s (kryo-serialized between stages), inputs arrive as the
  * spooled CBOR bytes, output is CBOR bytes again. `merge` is the
  * map-side combine Catalyst inserts before the shuffle. */
object ReduceAggregator extends Aggregator[BuildEmit, PoValue, Array[Byte]] {
  def zero: PoValue = null
  def reduce(buf: PoValue, e: BuildEmit): PoValue = {
    val v = Cbor.decode(e.value)
    if (buf == null) v else Reduce.merge(buf, v)
  }
  def merge(a: PoValue, b: PoValue): PoValue =
    if (a == null) b else if (b == null) a else Reduce.merge(a, b)
  def finish(r: PoValue): Array[Byte] = Cbor.encode(r)
  def bufferEncoder: Encoder[PoValue] = Encoders.kryo[PoValue]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
