package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.NfcNormalizeExpr

/** Unicode + whitespace text normalization — the pass every web-scale
  * corpus runs BEFORE dedup and quality scoring, because byte-distinct
  * spellings of the same text (decomposed accents, control garbage,
  * ragged whitespace) otherwise defeat exact dedup and skew token
  * counts.
  *
  * Three composable rules, all codegen'd column expressions (one narrow
  * projection at any scale, zero shuffles):
  *
  *   1. [[stripControls]] — remove C0 controls (except `\t` `\n` `\r`)
  *      and DEL: decode errors and terminal-escape residue, never
  *      legitimate text.
  *   2. [[nfc]] — Unicode canonical composition (UAX #15 NFC) via a
  *      native expression (`NfcNormalizeExpr`, JDK `java.text
  *      .Normalizer` with an allocation-free already-normalized fast
  *      path). NFC, not NFKC: canonical equivalence is safe to apply
  *      blindly; compatibility folding (ﬁ→fi, ²→2) is lossy and a
  *      policy choice left to callers.
  *   3. [[collapseWhitespace]] — runs of spaces/tabs/CR/NL become one
  *      space, then trim. (Pipelines that need paragraph structure
  *      keep `\n` — use the rules à la carte.)
  *
  * Pattern-dialect parity (the [[Pii]] rule): character classes are
  * explicit code-point ranges in the java.util.regex / RE2 common
  * subset, so the DuckDB oracle can run the identical patterns, and
  * DuckDB's `nfc_normalize` matches the JDK's NFC (both implement
  * UAX #15 over the same Unicode data).
  */
object Normalize {

  import org.apache.spark.sql.GraftSqlShim.{column => toCol, expression => toExpr}

  /** C0 controls minus `\t\n\r`, plus DEL — explicit ranges, RE2-safe. */
  val controlPattern: String = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Whitespace runs (space, tab, CR, NL) — deliberately NOT `\s`
    * (Java's includes `\x0B`, RE2's differs on Unicode space). */
  val whitespaceRunPattern: String = "[ \\t\\r\\n]+"

  def stripControls(text: Column): Column =
    regexp_replace(text, controlPattern, "")

  /** Unicode NFC via the native codegen'd expression. */
  def nfc(text: Column): Column = toCol(NfcNormalizeExpr(toExpr(text)))

  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, whitespaceRunPattern, " "))

  /** The standard full clean: strip → NFC → collapse. Controls go
    * first (a control between a base char and its combining mark would
    * block composition); whitespace last (NFC can introduce no new
    * whitespace, so the collapse result is final). */
  def clean(text: Column): Column =
    collapseWhitespace(nfc(stripControls(text)))

  // ---------------- confusable skeleton (r15) ----------------

  /** Confusable-character SKELETON (UTS #39 §4 "skeleton" in spirit,
    * over a curated high-frequency subset of the public confusables
    * table): map visually-indistinguishable code points to their Latin
    * targets and strip invisible joiners, so exact dedup catches the
    * classic evasion of swapping Latin letters for Cyrillic/Greek
    * lookalikes or fullwidth forms — byte-distinct, pixel-identical
    * documents. A full confusables.txt port is deliberately out: the
    * table below is the curated attack surface (Cyrillic + Greek
    * lowercase/uppercase lookalikes, fullwidth ASCII, curly quote /
    * dash folding, zero-width characters), every entry 1:1 so BOTH
    * engines express the map as one `translate` call — the oracle
    * replays it verbatim.
    *
    * Scale shape: pure scan-stage string expressions (translate +
    * lower), zero shuffles — skeletonization rides the same projection
    * as [[clean]]. */
  /** 1:1 confusable map — `ConfusableFrom(i)` renders as
    * `ConfusableTo(i)`. Order: Cyrillic lower, Cyrillic upper, Greek
    * lower, Greek upper, curly quotes/dashes. */
  val ConfusableFrom: String =
    "аеорсхуіѕј" + // а е о р с х у і ѕ ј
    "АВЕКМНОРСТХ" + // А В Е К М Н О Р С Т Х
    "ον" + // ο ν
    "ΑΒΕΖΗΙΚΜΝΟΡΤΥΧ" + // ΑΒΕΖΗΙΚΜΝΟΡΤΥΧ
    "‘’“”–—"
  val ConfusableTo: String =
    "aeopcxyisj" +
    "ABEKMHOPCTX" +
    "ov" +
    "ABEZHIKMNOPTYX" +
    "''\"\"--"
  /** invisible characters removed outright (ZWSP, ZWNJ, ZWJ, BOM) */
  val InvisibleChars: String = "​‌‍﻿"

  /** skeleton = fold fullwidth ASCII to halfwidth, map the confusable
    * table, drop invisibles, lowercase. Composable with [[clean]]. */
  def confusableSkeleton(text: Column): Column = {
    // fullwidth ！(U+FF01)..～(U+FF5E) ↔ ASCII !..~ : a contiguous
    // 94-char block, generated rather than spelled out
    val fwFrom = (0xff01 to 0xff5e).map(_.toChar).mkString
    val fwTo = (0x21 to 0x7e).map(_.toChar).mkString
    lower(translate(
      translate(translate(text, fwFrom, fwTo), ConfusableFrom, ConfusableTo),
      InvisibleChars, ""))
  }
}
