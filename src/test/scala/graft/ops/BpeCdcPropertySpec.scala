package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Differential + invariant properties for the round-11 per-row loops
  * (pure JVM code — no Spark session needed, so hundreds of cases are
  * cheap).
  *
  * bpeEncodeWord's production loop (min-rank pair, re-scan) is checked
  * against an INDEPENDENT reference implementation: apply each merge
  * to fixpoint in rank order via repeated left-to-right scans — the
  * textbook Sennrich formulation the scaladoc's equivalence argument
  * reduces to. Any divergence (including on same-token runs, which the
  * SQL oracle cannot replay) fails here.
  */
class BpeCdcPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(400), p)
    assert(r.passed, r.status.toString)
  }

  /** Reference BPE: merges applied in RANK ORDER, each to fixpoint
    * with left-to-right non-overlapping scans. */
  private def referenceEncode(word: String,
                              merges: IndexedSeq[(String, String)]): Vector[String] = {
    var toks: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      var changed = true
      while (changed) {
        changed = false
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out += (a + b); j += 2; changed = true
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
      .map(_.mkString)

  /** WELL-FORMED tables by construction — the class the equivalence
    * (and the q95 oracle) is stated for: grow a token pool from the
    * alphabet, each merge draws both components from the pool and
    * adds its output (the shape BPE training emits, same-token pairs
    * like (a,a) included). */
  private val mergesGen: Gen[IndexedSeq[(String, String)]] = {
    def step(pool: Vector[String], acc: Vector[(String, String)],
             n: Int): Gen[Vector[(String, String)]] =
      if (n == 0) Gen.const(acc)
      else for {
        a <- Gen.oneOf(pool)
        b <- Gen.oneOf(pool)
        r <- step(pool :+ (a + b), acc :+ ((a, b)), n - 1)
      } yield r
    Gen.chooseNum(0, 8)
      .flatMap(n => step(Vector("a", "b", "c", "d"), Vector.empty, n))
      .map(_.distinct.toIndexedSeq) // distinct keeps first occurrences: producers stay earlier
  }

  test("bpeEncodeWord matches the rank-order fixpoint reference on well-formed tables") {
    check(Prop.forAll(wordGen, mergesGen) { (w, merges) =>
      TextOps.validateMerges(merges) // generator must produce the stated class
      val rank = merges.zipWithIndex.toMap
      val got = TextOps.bpeEncodeWord(w, rank, merges).toVector
      val want = referenceEncode(w, merges)
      Prop(got == want) :| s"word=$w merges=$merges got=$got want=$want"
    })
  }

  test("non-well-formed tables diverge by order — validateMerges rejects them") {
    // the counterexample the first property run found: (ab,c) ranked
    // BEFORE the (a,b) that builds 'ab'. Min-rank (real BPE) reaches
    // [abc]; a rank-order replay stops at [ab, c].
    val bad = IndexedSeq(("ab", "c"), ("a", "b"))
    assert(TextOps.bpeEncodeWord("abc", bad.zipWithIndex.toMap, bad).toSeq == Seq("abc"))
    assert(referenceEncode("abc", bad) == Vector("ab", "c"))
    intercept[IllegalArgumentException](TextOps.validateMerges(bad))
    TextOps.validateMerges(Seq(("a", "b"), ("ab", "c"))) // ordered form is fine
  }

  test("bpeEncodeWord output always reassembles the word; tokens never empty") {
    check(Prop.forAll(wordGen, mergesGen) { (w, merges) =>
      val got = TextOps.bpeEncodeWord(w, merges.zipWithIndex.toMap, merges)
      Prop(got.mkString == w && got.forall(_.nonEmpty))
    })
  }

  // ---- robotsGate wildcard compilation, differentially ----

  /** Independent reference: per-URL nested loop over the rules with a
    * hand-rolled matcher (char-walk with backtracking '*', trailing
    * '$', everything else literal — no regex involved), RFC tie-break
    * (len DESC, allow DESC, pattern DESC). */
  private def refRobots(path: String,
                        rules: Seq[(String, Boolean)]): Option[(String, Boolean)] = {
    def matches(pat0: String, s: String): Boolean = {
      val anchored = pat0.endsWith("$")
      val pat = if (anchored) pat0.dropRight(1) else pat0
      def go(pi: Int, si: Int): Boolean =
        if (pi == pat.length) if (anchored) si == s.length else true
        else if (pat.charAt(pi) == '*')
          (si to s.length).exists(k => go(pi + 1, k))
        else si < s.length && s.charAt(si) == pat.charAt(pi) && go(pi + 1, si + 1)
      go(0, 0)
    }
    val hits = rules.filter { case (p, _) => matches(p, path) }
    if (hits.isEmpty) None
    else Some(hits.maxBy { case (p, allow) => (p.length, allow, p) })
  }

  test("robotsGate matches the char-walk reference on random wildcard rules") {
    val spark = graft.SparkTestBase.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // path/pattern alphabet stresses the escape class: regex
    // metacharacters appear as LITERALS in rules
    val pathChar = Gen.oneOf('a', 'b', '.', '+', '(', '9')
    val pathGen = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, pathChar)).map(cs => "/" + cs.mkString)
    val patGen = for {
      n <- Gen.chooseNum(0, 6)
      cs <- Gen.listOfN(n, Gen.frequency(5 -> pathChar, 2 -> Gen.const('*')))
      anchor <- Gen.oneOf("", "$")
    } yield "/" + cs.mkString + anchor
    val rulesGen = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.zip(patGen, Gen.oneOf(true, false))))
      .map(_.distinct)
    val p = Prop.forAll(Gen.listOfN(12, pathGen), rulesGen) { (paths, rules) =>
      val urls = paths.distinct.zipWithIndex
        .map { case (pth, i) => (i.toLong, s"https://d.com$pth") }
      val got = UrlOps.robotsGate(urls.toDF("doc_id", "url"),
          rules.map { case (p2, a) => ("d.com", p2, a) }.toDF("domain", "prefix", "allow"),
          col("url"))
        .select(col("id"), col("allowed"), col("matched_prefix"))
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(1), Option(r.getString(2))))).toMap
      val want = urls.map { case (i, _) =>
        val pth = paths.distinct(i.toInt)
        i -> (refRobots(pth, rules) match {
          case Some((pat, allow)) => (allow, Some(pat))
          case None => (true, None)
        })
      }.toMap
      Prop(got == want) :| s"paths=$paths rules=$rules got=$got want=$want"
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(r.passed, r.status.toString)
  }

  // ---- CDC invariants on the pure boundary arithmetic, via Spark-free
  // round-trip checks over the already-spec'd operator are in
  // BpeBloomSpec; here the BOUNDED mode gets randomized guards ----

  test("cdc guard arithmetic: forced cuts tile any doc length exactly") {
    // mirrors the forced-cut tail loop: every chunk in (0, maxLen]
    check(Prop.forAll(Gen.chooseNum(1, 5000), Gen.chooseNum(1, 300)) { (n, maxLen) =>
      var prev = 0L
      val ends = Iterator.iterate(prev + maxLen.toLong)(_ + maxLen)
        .takeWhile(_ < n).toVector :+ n.toLong
      val lens = ends.zip(0L +: ends).map { case (e, p) => e - p }
      Prop(lens.sum == n && lens.forall(l => l > 0 && l <= maxLen))
    })
  }
}
