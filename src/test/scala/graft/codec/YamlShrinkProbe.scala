package graft.codec

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Finds and shrinks a minimal YAML roundtrip failure (diagnostic). */
class YamlShrinkProbe extends AnyFunSuite {

  private def fails(v: PoValue): Boolean =
    try {
      val back = YamlCodec.decode(YamlCodec.encode(v))
      !CodecFuzzHelpers.nanEq(back, v)
    } catch { case _: Throwable => true }

  private def children(v: PoValue): Seq[PoValue] = v match {
    case PoArr(xs) => xs
    case s: PoSet => s.items
    case PoObj(f) => f.values.toSeq ++ f.keys.map(PoStr.apply)
    case m: PoMap => m.entries.flatMap(e => Seq(e._1, e._2))
    case _ => Seq.empty
  }

  private def shrink(v: PoValue): PoValue = {
    // descend into the smallest failing child; wrap leaves for context
    children(v).find(fails) match {
      case Some(c) => shrink(c)
      case None =>
        // no failing child alone; try singleton containers around children
        val v2 = v match {
          case PoObj(f) => f.toSeq.map { case (k, x) => PoObj(k -> x) }.find(fails)
          case m: PoMap => m.entries.map(e => PoMap.of(e._1 -> e._2)).find(fails)
          case PoArr(xs) => xs.map(x => PoArr(Vector(x))).find(fails)
          case s: PoSet => s.items.map(x => PoSet(x)).find(fails)
          case _ => None
        }
        v2.map(shrink).getOrElse(v)
    }
  }

  test("find minimal YAML failure") {
    val gen = new CodecFuzzSpecAccess().gen
    var found: Option[PoValue] = None
    var i = 0
    while (found.isEmpty && i < 2000) {
      val v = gen(Gen.Parameters.default.withSize(60), Seed(i.toLong)).get
      if (fails(v)) found = Some(v)
      i += 1
    }
    found match {
      case None => info("no failure in 2000 samples")
      case Some(v) =>
        val back = try Right(YamlCodec.decode(YamlCodec.encode(v)))
          catch { case e: Throwable => Left(e) }
        back match {
          case Left(e) => fail(s"THREW: $e")
          case Right(b) =>
            val path = diffPath(v, b, "")
            fail(s"FIRST DIFF at $path")
        }
    }
  }

  private def short(v: PoValue): String = {
    val s = v.toString
    if (s.length > 300) s.take(300) + "…" else s
  }

  private def diffPath(a: PoValue, b: PoValue, path: String): String = (a, b) match {
    case (PoArr(x), PoArr(y)) =>
      if (x.length != y.length) s"$path: arr len ${x.length} vs ${y.length}"
      else x.zip(y).zipWithIndex.collectFirst {
        case ((xa, yb), i) if !CodecFuzzHelpers.nanEq(xa, yb) => diffPath(xa, yb, s"$path[$i]")
      }.getOrElse(s"$path: arrays equal?")
    case (PoObj(x), PoObj(y)) =>
      if (x.keys.toSeq != y.keys.toSeq)
        s"$path: keys differ ${x.keys.toSet -- y.keys.toSet} / ${y.keys.toSet -- x.keys.toSet}"
      else x.keys.collectFirst {
        case k if !CodecFuzzHelpers.nanEq(x(k), y(k)) => diffPath(x(k), y(k), s"$path.$k")
      }.getOrElse(s"$path: objects equal?")
    case (x: PoSet, y: PoSet) =>
      if (x.items.length != y.items.length) s"$path: set size ${x.items.length} vs ${y.items.length}"
      else x.items.zip(y.items).zipWithIndex.collectFirst {
        case ((xa, yb), i) if !CodecFuzzHelpers.nanEq(xa, yb) => diffPath(xa, yb, s"$path{set $i}")
      }.getOrElse(s"$path: sets equal?")
    case (x: PoMap, y: PoMap) =>
      if (x.entries.length != y.entries.length) s"$path: map size ${x.entries.length} vs ${y.entries.length}"
      else x.entries.zip(y.entries).zipWithIndex.collectFirst {
        case (((k1, v1), (k2, v2)), i) if !CodecFuzzHelpers.nanEq(k1, k2) || !CodecFuzzHelpers.nanEq(v1, v2) =>
          if (!CodecFuzzHelpers.nanEq(k1, k2)) diffPath(k1, k2, s"$path{mapkey $i}")
          else diffPath(v1, v2, s"$path{mapval $i}")
      }.getOrElse(s"$path: maps equal?")
    case (x, y) => s"$path LEAF: ${short(x)}  VS  ${short(y)}"
  }
}

object CodecFuzzHelpers {
  def nanEq(a: PoValue, b: PoValue): Boolean = (a, b) match {
    case (PoNum(x), PoNum(y)) if x.isNaN && y.isNaN => true
    case (PoArr(x), PoArr(y)) =>
      x.length == y.length && x.zip(y).forall(t => nanEq(t._1, t._2))
    case (PoObj(x), PoObj(y)) =>
      x.keys.toSeq == y.keys.toSeq && x.keys.forall(k => nanEq(x(k), y(k)))
    case (x: PoSet, y: PoSet) =>
      x.items.length == y.items.length && x.items.zip(y.items).forall(t => nanEq(t._1, t._2))
    case (x: PoMap, y: PoMap) =>
      x.entries.length == y.entries.length &&
        x.entries.zip(y.entries).forall { case ((k1, v1), (k2, v2)) => nanEq(k1, k2) && nanEq(v1, v2) }
    case _ => a == b
  }
}

/** exposes the fuzz generator for the probe */
class CodecFuzzSpecAccess {
  private val spec = new CodecFuzzSpec
  def gen: Gen[PoValue] = {
    val m = classOf[CodecFuzzSpec].getDeclaredMethod("genValue", classOf[Int])
    m.setAccessible(true)
    m.invoke(spec, Integer.valueOf(3)).asInstanceOf[Gen[PoValue]]
  }
}
