package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C4-style line cleaning and corpus-wide duplicate-line removal:
  * each rule in isolation, doc-level drops, reassembly order, and the
  * remove-all-vs-keep-first contrast with paragraphDedup. */
class LineCleanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def clean(docs: Seq[(Long, String)], minWords: Int = 3,
                    banned: Seq[String] = Seq("javascript")) = {
    import spark.implicits._
    TextOps.c4LineClean(docs.toDF("doc_id", "text"), minWords = minWords,
        bannedLineWords = banned)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  private def dedup(docs: Seq[(Long, String)], maxOcc: Long = 1) = {
    import spark.implicits._
    TextOps.dedupLines(docs.toDF("doc_id", "text"), maxOccurrences = maxOcc)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  // ---- c4LineClean ----

  test("terminal punctuation rule: only . ! ? \" endings survive") {
    val r = clean(Seq((1L, "one two three.\nfour five six\nseven eight nine!\nten eleven twelve?\na b \"c\"")))
    assert(r == Seq((1L, "one two three.\nseven eight nine!\nten eleven twelve?\na b \"c\"", 4L, 1L)))
  }

  test("minWords rule counts non-empty space-separated words") {
    val r = clean(Seq((1L, "just two.\nnow three words.\n  padded   words  here.  ")))
    // lines are trimmed before the check; double spaces don't make words
    assert(r == Seq((1L, "now three words.\npadded   words  here.", 2L, 1L)))
  }

  test("banned line word is case-insensitive substring") {
    val r = clean(Seq((1L, "enable JavaScript to continue.\nplain good line here.")))
    assert(r == Seq((1L, "plain good line here.", 1L, 1L)))
  }

  test("doc-level markers drop the whole doc; all-lines-dropped docs vanish") {
    val r = clean(Seq(
      (1L, "fine line one.\nLorem Ipsum dolor sit."), // lorem ipsum -> gone
      (2L, "if (x) { return. }"),                     // curly brace -> gone
      (3L, "no punct here"),                          // nothing survives -> gone
      (4L, "kept entirely fine.")))
    assert(r == Seq((4L, "kept entirely fine.", 1L, 0L)))
  }

  // ---- dedupLines ----

  test("over-occurring lines are removed from EVERY doc (no survivor)") {
    val r = dedup(Seq(
      (1L, "shared footer line\nunique to one"),
      (2L, "Shared Footer Line\nunique to two")))  // identity is lowercased
    assert(r == Seq(
      (1L, "unique to one", 1L, 1L),
      (2L, "unique to two", 1L, 1L)))
  }

  test("in-doc repeats count toward the corpus total") {
    val r = dedup(Seq((1L, "twice\ntwice\nonce")))
    assert(r == Seq((1L, "once", 1L, 2L)))
  }

  test("maxOccurrences > 1 tolerates bounded repetition") {
    val r = dedup(Seq(
      (1L, "a b\nx"), (2L, "a b\ny"), (3L, "a b\nz")), maxOcc = 3)
    assert(r.map(_._2) == Seq("a b\nx", "a b\ny", "a b\nz"))
  }

  test("reassembly preserves original line order; empty lines dropped") {
    val r = dedup(Seq((1L, "first\n\n  \nsecond\nthird"), (2L, "second")))
    // 'second' occurs twice corpus-wide -> removed from both docs
    assert(r == Seq((1L, "first\nthird", 2L, 1L)))
  }

  test("docs with no surviving lines drop out entirely") {
    val r = dedup(Seq((1L, "dup"), (2L, "dup")))
    assert(r.isEmpty)
  }

  // ---- tokenDrift ----

  test("tokenDrift ranks by exact |a*B - b*A|; vocab is the full outer union") {
    import spark.implicits._
    val a = Seq((1L, "x x x y")).toDF("doc_id", "text")   // A=4: x3 y1
    val b = Seq((2L, "x y y z")).toDF("doc_id", "text")   // B=4: x1 y2 z1
    val out = TextOps.tokenDrift(a, b, k = 10, textCol = "text")
    // output-type contract: imbalance leaves as DOUBLE, never decimal
    assert(out.schema("imbalance").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val r = out.collect().map(row => (row.getString(0), row.getLong(1),
        row.getLong(2), row.getDouble(3).toLong)).toSeq
    // |a*4 - b*4|: x |12-4|=8, y |4-8|=4, z |0-4|=4 -> x first, then y,z by token
    assert(r == Seq(("x", 3L, 1L, 8L), ("y", 1L, 2L, 4L), ("z", 0L, 1L, 4L)))
  }

  test("mixedLanguageDocs flags only window-level disagreement") {
    import spark.implicits._
    val en = ("the of and to in is that it for a " * 10).trim // 20 windows? no: ~390 chars
    val docs = Seq(
      (1L, en),                                          // en everywhere -> not mixed
      (2L, en + (" der die das und ist" * 10)),          // en then de windows
      (3L, "zz yy xx ww vv"))                            // und only -> not mixed
    val r = TextOps.mixedLanguageDocs(docs.toDF("doc_id", "text"),
        windowChars = 200)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getString(3))).toSeq
    assert(r.map(_._1) == Seq(2L))
    assert(r.head._3.split(",").contains("de") && r.head._2 >= 2)
  }

  test("tokenDrift k truncates on the deterministic (imbalance, token) order") {
    import spark.implicits._
    val a = Seq((1L, "p q")).toDF("doc_id", "text")
    val b = Seq((2L, "r s")).toDF("doc_id", "text")
    val r = TextOps.tokenDrift(a, b, k = 2, textCol = "text")
      .collect().map(_.getString(0)).toSeq
    // all four tokens tie at |1*2 - 0*2| = 2 -> token asc breaks: p, q
    assert(r == Seq("p", "q"))
  }
}
