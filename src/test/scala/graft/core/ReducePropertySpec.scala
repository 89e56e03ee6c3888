package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the merge lattice.
  *
  * The soundness condition for the partial-aggregation lens path
  * (CommutativeMapFn) is: values emitted under one key are
  * TYPE-CONSISTENT and drawn from the commutative branches (numbers sum,
  * Sets union, dates max, objects/maps of those merge per key). On that
  * fragment merge is commutative and associative AT EQUALITY LEVEL
  * (object/map key order is presentation; equality and the canonical
  * hash are insertion-order independent), so Catalyst may re-associate
  * and reorder partial merges freely.
  *
  * Mixed-type merges are last-wins BY SPEC (reduce.js:14-18) — neither
  * commutative nor associative — which is exactly why the default lens
  * path folds in a fixed global order.
  */
class ReducePropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  /** A shape (schema) for type-consistent generation. */
  private sealed trait Shape
  private case object SInt extends Shape
  private case object SDate extends Shape
  private case object SSet extends Shape
  private case class SObj(fields: Map[String, Shape]) extends Shape
  private case class SMap(entries: Map[Int, Shape]) extends Shape

  private def genShape(depth: Int): Gen[Shape] =
    if (depth <= 0) Gen.oneOf(SInt, SDate, SSet)
    else Gen.frequency(
      3 -> genShape(0),
      1 -> Gen.mapOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.lzy(genShape(depth - 1))))
        .map(SObj.apply),
      1 -> Gen.mapOf(Gen.zip(Gen.chooseNum(0, 4), Gen.lzy(genShape(depth - 1))))
        .map(SMap.apply))

  /** A value conforming to the shape; object/map keys may be present or
    * absent per value (disjoint keys append on merge), but a present key
    * always carries the shape's type. */
  private def genOf(s: Shape): Gen[PoValue] = s match {
    case SInt => Gen.chooseNum(-1000000L, 1000000L).map(PoInt.apply)
    case SDate => Gen.chooseNum(-4102444800000L, 4102444800000L).map(PoDate.apply)
    case SSet => Gen.listOf(Gen.chooseNum(0, 50).map(i => PoStr(s"m$i"))).map(PoSet.fromSeq)
    case SObj(fields) =>
      Gen.sequence[Vector[Option[(String, PoValue)]], Option[(String, PoValue)]](
        fields.toVector.map { case (k, fs) =>
          Gen.option(genOf(fs).map(k -> _))
        }).map(opts => PoObj(scala.collection.immutable.VectorMap.from(opts.flatten)))
    case SMap(entries) =>
      Gen.sequence[Vector[Option[(PoValue, PoValue)]], Option[(PoValue, PoValue)]](
        entries.toVector.map { case (k, es) =>
          Gen.option(genOf(es).map(v => (PoInt(k.toLong): PoValue) -> v))
        }).map(opts => PoMap(opts.flatten))
  }

  private val genPair: Gen[(PoValue, PoValue)] =
    genShape(2).flatMap(s => Gen.zip(genOf(s), genOf(s)))
  private val genTriple: Gen[(PoValue, PoValue, PoValue)] =
    genShape(2).flatMap(s => Gen.zip(genOf(s), genOf(s), genOf(s)))

  test("commutative fragment: merge(a,b) == merge(b,a)") {
    check(Prop.forAll(genPair) { case (a, b) =>
      Reduce.merge(a, b) == Reduce.merge(b, a)
    })
  }

  test("commutative fragment: merge is associative") {
    check(Prop.forAll(genTriple) { case (a, b, c) =>
      Reduce.merge(Reduce.merge(a, b), c) == Reduce.merge(a, Reduce.merge(b, c))
    })
  }

  test("commutative fragment: canonical hash is merge-order independent") {
    check(Prop.forAll(genTriple) { case (a, b, c) =>
      Cbor.hash(Reduce.merge(Reduce.merge(a, b), c)) ==
        Cbor.hash(Reduce.merge(c, Reduce.merge(b, a)))
    })
  }

  test("mixed types are last-wins by spec — NOT commutative (why ordered path exists)") {
    val a = PoInt(1)
    val b = PoStr("x")
    assert(Reduce.merge(a, b) == b)
    assert(Reduce.merge(b, a) == a)
  }
}
