package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Corpus-wide paragraph dedup: global first-occurrence rule, in-doc
  * duplicates, reassembly order, whitespace paragraphs, determinism. */
class ParagraphDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    Dedup.paragraphDedup(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  private def md5Of(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("globally-first occurrence survives; later docs drop the repeat") {
    val got = run(Seq(
      (1L, "unique alpha\n\nshared boilerplate\n\nunique beta"),
      (2L, "shared boilerplate\n\nunique gamma"),
      (3L, "unique delta\n\nshared boilerplate")))
    assert(got == Seq(
      (1L, 3L, 3L, md5Of("unique alpha\n\nshared boilerplate\n\nunique beta")),
      (2L, 2L, 1L, md5Of("unique gamma")),
      (3L, 2L, 1L, md5Of("unique delta"))))
  }

  test("duplicate WITHIN one doc keeps only the first position") {
    val got = run(Seq((1L, "same para\n\nother\n\nsame para")))
    assert(got == Seq((1L, 3L, 2L, md5Of("same para\n\nother"))))
  }

  test("a doc whose every paragraph is seen earlier keeps empty text") {
    val got = run(Seq(
      (1L, "a a a\n\nb b b"),
      (2L, "a a a\n\nb b b")))
    assert(got(1) == ((2L, 2L, 0L, md5Of(""))))
  }

  test("blank/whitespace paragraphs are not paragraphs; 3+ newlines split once") {
    val got = run(Seq((1L, "first\n\n   \n\nsecond\n\n\n\nthird")))
    // "   " is whitespace-only → dropped; the 4-newline run is ONE break
    assert(got == Seq((1L, 3L, 3L, md5Of("first\n\nsecond\n\nthird"))))
  }

  test("membership and reassembly survive repartitioning") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"common header\n\nbody text $i\n\ncommon footer"))
    val a = run(docs)
    val b = Dedup.paragraphDedup(
        docs.toDF("doc_id", "text").repartition(13))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(a == b)
    // doc 1 keeps all three; every later doc keeps only its body
    assert(a.head._3 == 3L)
    assert(a.tail.forall(_._3 == 1L))
  }
}
