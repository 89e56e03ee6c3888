package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** PII detection/redaction semantics on literal fixtures — pattern
  * shapes, global replace, rule ordering, passthrough. */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(s: String): (Int, Int, Int, String) = {
    import spark.implicits._
    val row = Seq(s).toDF("text")
      .select(Pii.stats(col("text")).as("p"), Pii.redact(col("text")).as("r"))
      .select(col("p.n_emails"), col("p.n_phones"), col("p.n_ips"), col("r"))
      .collect()(0)
    (row.getInt(0), row.getInt(1), row.getInt(2), row.getString(3))
  }

  test("counts and redacts each kind") {
    val (e, p, i, r) =
      run("mail a.b+c@sub.example.org call +44-123-4567 host 192.168.0.1 done")
    assert((e, p, i) == (1, 1, 1))
    assert(r == "mail <EMAIL> call <PHONE> host <IP> done")
  }

  test("replaces ALL occurrences, not just the first") {
    val (e, _, i, r) = run("x@y.com then z@w.net and 1.2.3.4 plus 5.6.7.8")
    assert(e == 2 && i == 2)
    assert(r == "<EMAIL> then <EMAIL> and <IP> plus <IP>")
  }

  test("email rule consumes a dotted-quad local part before the ipv4 rule sees it") {
    val (e, _, i, r) = run("from 1.2.3.4@host.com ok")
    assert(e == 1)
    // stats counts each pattern independently (the quad IS ipv4-shaped);
    // redaction is ordered, so the email sentinel wins
    assert(i == 1)
    assert(r == "from <EMAIL> ok")
  }

  test("no PII: text passes through byte-identical") {
    val s = "plain words only, version 1.2 at 3pm + 4 things"
    val (e, p, i, r) = run(s)
    assert((e, p, i) == (0, 0, 0))
    assert(r == s)
  }

  test("word boundary: ipv4 inside a longer dotted run still matches leftmost-first") {
    // same nonoverlapping leftmost-first semantics as RE2 — pinned here
    // so an engine change would surface as a spec failure, not an
    // oracle hash mismatch
    val (_, _, i, r) = run("chain 1.2.3.4.5 end")
    assert(i == 1)
    assert(r == "chain <IP>.5 end")
  }

  test("phone shape is narrow: bare digit runs and dates do not match") {
    val (_, p, _, _) = run("on 2024-01-02 order 123-456-7890 total +1000")
    assert(p == 0)
  }

  test("custom rules compose left-to-right") {
    import spark.implicits._
    val r = Seq("secret abc123 here").toDF("text")
      .select(Pii.redactCustom(col("text"),
        Seq(("id", "abc[0-9]+", "<ID>"), ("tag", "<ID> here", "<GONE>"))).as("r"))
      .collect()(0).getString(0)
    assert(r == "secret <GONE>")
  }
}

/** Substring-level dedup semantics on hand-built fixtures. */
class DuplicateSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def spans(n: Int, docs: (Long, String)*): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), n = n)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("a shared run yields one maximal span per doc; unique text yields none") {
    val shared = "alpha beta gamma delta epsilon"
    val got = spans(3,
      1L -> s"one two $shared three",
      2L -> s"$shared nine eight seven",
      3L -> "totally unrelated words only here")
    // doc 1: shared 5-token run starts at token 3; doc 2: at token 1.
    // Three 3-gram starts each → maximal span of 3+3-1 = 5 tokens.
    assert(got == Set((1L, 3L, 5L), (2L, 1L, 5L)))
  }

  test("two disjoint duplicated runs stay two islands") {
    val got = spans(2,
      1L -> "aa bb xx yy zz cc dd",
      2L -> "aa bb qq1 qq2 qq3 cc dd")
    assert(got == Set((1L, 1L, 2L), (1L, 6L, 2L), (2L, 1L, 2L), (2L, 6L, 2L)))
  }

  test("intra-doc repetition alone is NOT a duplicated span (cross-doc only)") {
    val got = spans(2,
      1L -> "rep rep rep rep",
      2L -> "other words entirely distinct")
    assert(got.isEmpty)
  }

  test("doc shorter than n contributes nothing") {
    val got = spans(8, 1L -> "short text", 2L -> "short text")
    assert(got.isEmpty)
  }

  test("random corpora match a brute-force span oracle (seeded)") {
    // small vocab forces plenty of cross-doc gram collisions, so both
    // single-position islands and long merged runs occur
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val n = 2
    val docs = (1L to 30L).map { id =>
      id -> Array.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }

    def brute: Set[(Long, Long, Long)] = {
      val grams: Map[Long, Vector[String]] = docs.map { case (id, text) =>
        id -> text.split(" ").toVector.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toVector
      }.toMap
      val docsByGram = grams.toSeq
        .flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
      grams.toSeq.flatMap { case (id, gs) =>
        val dupPos = gs.zipWithIndex
          .collect { case (g, i) if docsByGram(g).size >= 2 => (i + 1).toLong }
        // merge runs of consecutive positions into (start, span_tokens)
        dupPos.foldLeft(List.empty[(Long, Long)]) {
          case ((s, len) :: rest, p) if p == s + len => (s, len + 1) :: rest
          case (acc, p) => (p, 1L) :: acc
        }.map { case (s, len) => (id, s, len + n - 1) }
      }.toSet
    }

    val got = spans(n, docs: _*)
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(got.nonEmpty, "seeded corpus must contain duplicated spans")
  }

  // ---- cardStats / luhnValid ----

  test("cardStats: known-valid numbers pass Luhn, off-by-one check digits fail") {
    import spark.implicits._
    val docs = Seq(
      (1L, "pay with 4532015112830366 today"),       // valid (test number)
      (2L, "pay with 4532015112830367 today"),       // check digit +1 -> invalid
      (3L, "grouped 4532-0151-1283-0366 form"),       // dashed, valid
      (4L, "grouped 4532 0151 1283 0366 form"),       // spaced, valid
      (5L, "short 453201511283036 run"),              // 15 digits -> no candidate
      (6L, "long 45320151128303662 run"),             // 17 digits -> \b kills it
      (7L, "none at all"))
    val r = Pii.cardStats(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 1L),
      (4L, 1L, 1L), (5L, 0L, 0L), (6L, 0L, 0L), (7L, 0L, 0L)))
  }

  test("luhnValid brute-check against a Scala reference over random digits") {
    import spark.implicits._
    def ref(s: String): Boolean = {
      val sum = s.zipWithIndex.map { case (ch, idx) =>
        val d = ch - '0'
        val dbl = if ((16 - (idx + 1)) % 2 == 1) d * 2 else d
        if (dbl > 9) dbl - 9 else dbl
      }.sum
      sum % 10 == 0
    }
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i.toLong, (1 to 16).map(_ => rnd.nextInt(10)).mkString) }
    val got = rows.toDF("id", "s")
      .select(col("id"), Pii.luhnValid(col("s")).as("v"))
      .as[(Long, Boolean)].collect().toMap
    rows.foreach { case (id, s) =>
      assert(got(id) == ref(s), s"$s: engine ${got(id)} vs ref ${ref(s)}") }
  }
}
