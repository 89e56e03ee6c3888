package graft.core

/** The system reduce — the fixed merge lattice applied pairwise
  * left-to-right over every value emitted under the same output id
  * (reference: library/utility/reduce.js:13-53, behavior pinned by
  * test/test-utility-reduce.js:8-88).
  *
  * Order-sensitive: last-wins and array-concat depend on input order, so
  * distributed execution must fold in input ordinal order (see
  * LensBuild). Only some branches (sum, set-union, date-max) are
  * commutative/associative enough for partial aggregation; v1 keeps exact
  * semantics with a single ordered fold per key.
  */
object Reduce {

  /** merge(left, right) — `right` is the later value. */
  def merge(a: PoValue, b: PoValue): PoValue = {
    if (a.typeName != b.typeName) return b // mismatched types: last wins
    (a, b) match {
      case (x: PoSet, y: PoSet) => x.union(y)
      case (PoArr(x), PoArr(y)) => PoArr(x ++ y) // depth-1 concat
      case (PoInt(x), PoInt(y)) => PoInt(x + y)
      case (PoInt(x), PoNum(y)) => PoNum(x + y)
      case (PoNum(x), PoInt(y)) => PoNum(x + y)
      case (PoNum(x), PoNum(y)) => PoNum(x + y)
      case (PoBigInt(x), PoBigInt(y)) => PoBigInt(x + y)
      case (x: PoMap, y: PoMap) =>
        // recursive merge per key; right-only keys appended in their order
        y.entries.foldLeft(x) { case (acc, (k, v)) =>
          acc.get(k) match {
            case Some(prev) => acc.updated(k, merge(prev, v))
            case None       => acc.updated(k, v)
          }
        }
      case (PoObj(x), PoObj(y)) =>
        var acc = x
        y.foreach { case (k, v) =>
          acc = acc.updated(k, acc.get(k) match {
            case Some(prev) => merge(prev, v)
            case None       => v
          })
        }
        PoObj(acc)
      case (PoDate(x), PoDate(y)) => PoDate(math.max(x, y)) // most future
      case _ => b // string, bytes, bool, null, undefined, url: last wins
    }
  }

  /** Ordered fold of 1..n values (the lens build's per-id reduce,
    * reference: library/models/lens.js:204-215). */
  def reduceAll(values: Iterator[PoValue]): PoValue =
    values.reduceLeft(merge)
}
