package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Complexity-shape guards for the structures on the lens-reduce hot
  * path. These bound wall-clock generously: the quadratic r1 shapes take
  * minutes at these sizes, the fixed linear/log shapes take well under a
  * second, so the tests are stable while still failing hard on a
  * complexity regression.
  */
class PerfShapeSpec extends AnyFunSuite {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test("PoSet union of two 100k-member sets is linear, not quadratic") {
    val a = PoSet.fromSeq((0 until 100000).map(i => PoInt(i.toLong)))
    val b = PoSet.fromSeq((50000 until 150000).map(i => PoInt(i.toLong)))
    val (u, secs) = timed(a.union(b))
    assert(u.size == 150000)
    assert(u.items.take(3) == Vector(PoInt(0), PoInt(1), PoInt(2)))
    assert(secs < 6.0, s"union took ${secs}s — quadratic regression?")
  }

  test("folding 50k singleton sets (the inverted-index hot loop) is linear") {
    val singletons = (0 until 50000).map(i => PoSet(PoStr(s"doc$i")): PoValue)
    val (merged, secs) = timed(Reduce.reduceAll(singletons.iterator))
    assert(merged.asInstanceOf[PoSet].size == 50000)
    assert(secs < 6.0, s"fold took ${secs}s — quadratic regression?")
  }

  test("PoMap recursive merge over 50k keys is linear") {
    val left = PoMap((0 until 50000).map(i => (PoInt(i.toLong): PoValue, PoInt(1L): PoValue)).toVector)
    val right = PoMap((25000 until 75000).map(i => (PoInt(i.toLong): PoValue, PoInt(1L): PoValue)).toVector)
    val (m, secs) = timed(Reduce.merge(left, right).asInstanceOf[PoMap])
    assert(m.size == 75000)
    assert(m.get(PoInt(30000L)).contains(PoInt(2L))) // overlap summed
    assert(m.get(PoInt(10L)).contains(PoInt(1L)))
    assert(secs < 6.0, s"merge took ${secs}s — quadratic regression?")
  }

  test("canonical CBOR of a deeply nested value encodes each node once") {
    // depth-1000 linear nesting through sets (the sort-key path) with a
    // 2 KB payload per level: r1 re-encoded the subtree at every level,
    // O(depth × size) ≈ 1 GB of redundant encoding here; single-pass is
    // ~2 MB and instant.
    val pad = "p" * 2048
    var v: PoValue = PoStr("leaf")
    (0 until 1000).foreach { i =>
      v = PoObj("a" -> PoSet(PoStr(s"$pad$i"), v))
    }
    val (h, secs) = timed(Cbor.hash(v))
    assert(h.length == 64)
    assert(secs < 6.0, s"canonical encode took ${secs}s — re-encoding subtrees?")
  }
}
