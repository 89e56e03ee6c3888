package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** FIM split (q140) and vocabulary coverage (q141): boundary exactness
  * against a from-scratch Scala reference, part-size invariants, the
  * plain-mode gate, and prefix-sum correctness vs a serial cumsum. */
class FimVocabSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ---------------- fimSplit ----------------

  private def referenceFim(id: Long, text: String, minChars: Int = 16)
      : (String, Long, Long, Long, String) = {
    val t = Option(text).getOrElse("")
    val l = t.length.toLong
    if (l < minChars) ("plain", l, 0L, 0L, md5Hex(t))
    else {
      val p1 = 1L + (id * 7919L) % (l - 2L)
      val mid = 1L + (id * 104729L) % (l - p1 - 1L)
      val prefix = t.substring(0, p1.toInt)
      val middle = t.substring(p1.toInt, (p1 + mid).toInt)
      val suffix = t.substring((p1 + mid).toInt)
      ("fim", p1, mid, l - p1 - mid,
        md5Hex(s"<PRE>$prefix<SUF>$suffix<MID>$middle"))
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("fimSplit matches the reference on every boundary length") {
    import spark.implicits._
    // lengths 0..40 straddle the minChars gate; ids vary the pivots
    val rows = (0L to 60L).map(i =>
      (i, ("the quick brown fox jumps over it " * 3).take((i % 41).toInt)))
    val got = TextOps.fimSplit(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    rows.foreach { case (id, text) =>
      assert(got(id) == referenceFim(id, text), s"id=$id text='$text'")
    }
  }

  test("fimSplit invariants: parts >= 1 in fim mode, sizes sum to length") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, s"document body number $i with some drift ${"x" * (i % 37).toInt}"))
    val out = TextOps.fimSplit(rows.toDF("doc_id", "text")).collect()
    out.foreach { r =>
      val (mode, p, m, s) = (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val len = rows(r.getLong(0).toInt - 1)._2.length
      assert(p + m + s == len)
      if (mode == "fim") assert(p >= 1 && m >= 1 && s >= 1)
      else assert(m == 0 && s == 0)
    }
  }

  test("fimSplit: NULL text passes through as an empty plain doc") {
    import spark.implicits._
    val out = TextOps.fimSplit(
        Seq((1L, null: String)).toDF("doc_id", "text")).collect()(0)
    assert(out.getString(1) == "plain" && out.getLong(2) == 0 &&
      out.getString(5) == md5Hex(""))
  }

  // ---------------- vocabCoverage ----------------

  test("vocabCoverage equals the serial cumulative-sum reference") {
    import spark.implicits._
    // heavy-tailed corpus across many partitions so the parallel
    // prefix sum crosses partition boundaries
    val docs = (1 to 500).map { i =>
      val tok = if (i % 2 == 0) "alpha" else if (i % 3 == 0) "beta" else s"rare$i"
      (i.toLong, s"$tok filler$i $tok")
    }
    val df = docs.toDF("doc_id", "text").repartition(8)
    val ths = Seq(50, 90, 95, 99)
    val got = TextOps.vocabCoverage(df, ths)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    // serial reference
    val toks = docs.flatMap(_._2.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
    val freq = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }
    val total = freq.map(_._2).sum
    var cum = 0L
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    freq.zipWithIndex.foreach { case ((_, n), idx) =>
      val before = cum; cum += n
      ths.foreach { p =>
        if (before * 100L < total * p && cum * 100L >= total * p)
          expected(p.toLong) = ((idx + 1).toLong, cum, total)
      }
    }
    assert(got == expected.toMap)
  }

  test("vocabCoverage: 100% threshold needs the whole vocabulary") {
    import spark.implicits._
    val df = Seq((1L, "a a b c"), (2L, "a d")).toDF("doc_id", "text")
    val out = TextOps.vocabCoverage(df, Seq(100)).collect()(0)
    // 4 distinct tokens, 6 occurrences
    assert(out.getLong(1) == 4 && out.getLong(2) == 6 && out.getLong(3) == 6)
  }
}
