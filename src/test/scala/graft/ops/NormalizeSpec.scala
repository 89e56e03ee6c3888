package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Normalization rule semantics and ordering — each rule alone, the
  * composed clean(), and the native nfc_normalize expression via SQL.
  * All non-ASCII fixture chars are built from code points explicitly
  * so the fixture bytes are unambiguous in source. */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val acute = "\u0301"      // combining acute
  private val eAcute = "\u00e9"     // precomposed
  private val bel = "\u0007"

  private def one(c: org.apache.spark.sql.Column, s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(c.as("r")).collect()(0).getString(0)
  }

  test("stripControls removes C0+DEL but keeps tab, CR, NL") {
    assert(one(Normalize.stripControls(col("t")), "a" + bel + "bcd\te\rf\ng") ==
      "abcd\te\rf\ng")
  }

  test("nfc composes decomposed accents and is identity on composed input") {
    val decomposed = "caf" + "e" + acute
    val composed = "caf" + eAcute
    assert(one(Normalize.nfc(col("t")), decomposed) == composed)
    assert(one(Normalize.nfc(col("t")), composed) == composed)
  }

  test("collapseWhitespace folds runs and trims ends") {
    assert(one(Normalize.collapseWhitespace(col("t")), "  a \t b\r\n\nc  ") == "a b c")
  }

  test("clean order matters: control between base and mark must strip before NFC") {
    // e BEL combining-acute: NFC alone cannot compose across the BEL;
    // stripping first yields the precomposed char. A swapped rule
    // order would leave e+acute uncomposed (2 chars, different bytes).
    val s = "caf" + "e" + bel + acute + " done"
    assert(one(Normalize.clean(col("t")), s) == "caf" + eAcute + " done")
  }

  test("clean collapses whitespace last and trims") {
    assert(one(Normalize.clean(col("t")), " x   y\t\tz ") == "x y z")
  }

  test("nfc_normalize is registered as a SQL function") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    val r = Seq("caf" + "e" + acute).toDF("t")
      .selectExpr("nfc_normalize(t) as r").collect()(0).getString(0)
    assert(r == "caf" + eAcute)
  }

  test("nfc passes null through (null-safe unary expression)") {
    import spark.implicits._
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(Normalize.nfc(col("t")).as("r")).collect()(0)
    assert(r.isNullAt(0))
  }
  test("confusableSkeleton folds Cyrillic/Greek/fullwidth lookalikes and strips invisibles (r15)") {
    val sk = Normalize.confusableSkeleton(col("t"))
    // Cyrillic а/е/о/р/с/х/у render identically to Latin — the classic swap
    assert(one(sk, "p\u0430yp\u0430l") == "paypal")     // а (U+0430)
    assert(one(sk, "\u0441\u043e\u0440y") == "copy")   // с о (U+0441 U+043E)
    // uppercase Cyrillic + Greek capitals fold THEN lowercase
    assert(one(sk, "\u041d\u0415LLO") == "hello")       // Н Е (U+041D U+0415)
    assert(one(sk, "\u0391\u0392C") == "abc")           // Α Β (Greek)
    // fullwidth ASCII block folds to halfwidth before lowering
    assert(one(sk, "\uff28\uff45\uff4c\uff4c\uff4f\uff01") == "hello!")
    assert(one(sk, "\uff10\uff11\uff12") == "012")
    // zero-width characters vanish; curly quotes/dashes normalize
    assert(one(sk, "te\u200bst\u200d!") == "test!")
    assert(one(sk, "\u2018a\u2019 \u201cb\u201d \u2013 \u2014") == "'a' \"b\" - -")
    // plain ASCII is just lowercased — the skeleton is idempotent there
    assert(one(sk, "Plain ASCII 123") == "plain ascii 123")
  }
}
