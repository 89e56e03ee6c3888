package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the standard pre-training scrub stage
  * (emails, phone numbers, IP addresses) that every large-scale corpus
  * pipeline runs before text leaves curation.
  *
  * Everything is codegen'd `regexp_extract_all` / `regexp_replace`
  * column expressions — no UDFs, so detection and redaction stay inside
  * whole-stage codegen and scale linearly with executors; at 100 TB the
  * whole stage is a single narrow projection (zero shuffles).
  *
  * Pattern-dialect parity: the patterns are deliberately restricted to
  * the common subset of java.util.regex (Spark) and RE2 (DuckDB — the
  * oracle engine): no lookaround, no backreferences, character classes
  * spelled as explicit ranges (`[0-9]`, not `\d` — Java's `\d`/`\s` and
  * RE2's disagree on edge code points; the `TextOps.bpePattern` lesson).
  * `\b` is safe: both engines define word chars as `[A-Za-z0-9_]`.
  *
  * Redaction replaces every match with a typed sentinel (`<EMAIL>`,
  * `<PHONE>`, `<IP>`), all occurrences per document (Spark's
  * `regexp_replace` is global; the oracle must pass the `'g'` flag).
  * The email pass runs FIRST so a digits-and-dots local part like
  * `1.2.3.4@host.com` is consumed as one email before the IPv4 pass
  * can see its prefix. Linkability-preserving pseudonymization (match →
  * per-match hash token) is deliberately absent: it needs a per-match
  * function application, which no codegen'd replace expression offers —
  * it would force a UDF onto the hot path for a niche variant.
  */
object Pii {

  /** Practical RFC-5322-subset email shape. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** E.164-with-dashes phone shape: `+<cc>-<3 digits>-<4 digits>`.
    * Deliberately narrow — a broad "digit soup" phone pattern false-
    * positives on IDs and timestamps; callers with other locale shapes
    * pass their own (pattern, sentinel) via [[redactCustom]]. */
  val phonePattern: String = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}\\b"

  /** IPv4-shaped dotted quad (no octet-range check: `999.0.0.1` is not
    * a valid address but IS something a scrubber should remove). */
  val ipv4Pattern: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** (kind, pattern, sentinel) in application order — email first (see
    * object scaladoc for why order matters). */
  val defaultRules: Seq[(String, String, String)] = Seq(
    ("email", emailPattern, "<EMAIL>"),
    ("phone", phonePattern, "<PHONE>"),
    ("ipv4", ipv4Pattern, "<IP>"))

  /** Per-document match counts as struct(n_emails, n_phones, n_ips) —
    * one regexp scan per kind, all in one projection. */
  def stats(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(emailPattern), lit(0))).as("n_emails"),
    size(regexp_extract_all(text, lit(phonePattern), lit(0))).as("n_phones"),
    size(regexp_extract_all(text, lit(ipv4Pattern), lit(0))).as("n_ips"))

  /** All default rules applied in order; every occurrence replaced. */
  def redact(text: Column): Column = redactCustom(text, defaultRules)

  /** Chained global replace over caller-supplied (kind, pattern,
    * sentinel) rules — rules compose left-to-right, so earlier rules
    * consume text later ones never see. */
  def redactCustom(text: Column, rules: Seq[(String, String, String)]): Column =
    rules.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** k-anonymity gate over quasi-identifier columns (Sweeney 2002) —
    * the release-side counterpart of [[redact]]: scrubbing direct
    * identifiers is not enough when a COMBINATION of innocuous
    * attributes (language × source × size band × …) is rare enough to
    * fingerprint a record. The gate keeps only rows whose
    * quasi-identifier tuple is shared by at least `k` rows, the
    * standard minimum-cell-size rule for data releases, and a real
    * curation step when a training corpus carries provenance columns.
    *
    * Plan shape: ONE window exchange on the QI tuple (a count-only
    * window frame — streaming, no partition buffering), then a
    * codegen'd filter. Deliberately a window and not a groupBy+join:
    * the join would shuffle the corpus TWICE on the same key. A hot
    * QI cell is just a count, and rows that share a cell had to meet
    * anyway for the cell to be countable.
    *
    * Output: the kept rows plus their `group_size`, so downstream can
    * audit how close each survivor sits to the threshold. */
  def kAnonymityGate(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2 (k=$k is no gate)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
    df.withColumn("group_size", count(lit(1)).over(w))
      .filter(col("group_size") >= k)
  }

  /** t-closeness gate (Li et al., ICDE 2007) — the refinement
    * l-diversity needs when a QI group's sensitive values are diverse
    * but SKEWED: a group can span l distinct values yet concentrate on
    * one of them far beyond the corpus baseline, and the attacker's
    * posterior shift is the leak. Keep only rows whose QI group's
    * sensitive-value distribution sits within Earth Mover's Distance
    * `tNum/tDen` of the GLOBAL distribution, under the ordered-attribute
    * EMD of the paper: D(P,Q) = (1/(m-1))·Σ_i |Σ_{j≤i}(p_j − q_j)|.
    *
    * Exactness: every p_j, q_j is a ratio of counts, so each cumulative
    * term is the integer N·cum_c − n_g·cum_C over the common denominator
    * n_g·N, and the gate comparison cross-multiplies into pure integer
    * arithmetic — DECIMAL(38,0) products (counts can exceed 2^31 at
    * corpus scale, and products of two counts overflow Long), compared
    * exactly. No float enters the decision; the audit `emd` column is
    * one int→double division at the end (IEEE-exact on any engine).
    *
    * Plan shape: the corpus shuffles ONCE (the (QI, sensitive) count);
    * everything after runs on group×m-bounded rows — the global
    * distribution (m rows) broadcasts, the zero-filled grid gets its
    * cumulative sums from windows over the SAME QI partitioning its
    * groupBy then reuses (no second corpus exchange), and the verdict
    * table joins back broadcast (QI-group cardinality is orders below
    * row cardinality for any meaningful quasi-identifier).
    *
    * Sensitive values are ordered by their natural column ordering —
    * the "ordered attribute" variant; for nominal attributes the paper's
    * equal-distance EMD differs only by dropping the cumulation, and
    * the ordered form is the stricter, more common gate.
    *
    * Output: kept rows + `group_n` and the audit `emd`. A single
    * sensitive value corpus-wide (m = 1) keeps everything with emd 0.
    */
  def tClosenessGate(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                     tNum: Long, tDen: Long): DataFrame = {
    require(qiCols.nonEmpty, "t-closeness needs at least one quasi-identifier")
    require(tNum >= 0 && tDen > 0, s"threshold must be a ratio >= 0, got $tNum/$tDen")
    val qc = qiCols.map(col)
    // NOTE on names: Spark (and the oracle engine) resolve identifiers
    // case-insensitively, so the group count and global count must not
    // be spelled c / C — hence __gc / __glc.
    val globalDist = df.groupBy(col(sensitiveCol).as("__s"))
      .agg(count(lit(1)).as("__glc"))
    val totals = globalDist.agg(sum(col("__glc")).as("__n_all"),
      count(lit(1)).as("__m"))
    val gDist = globalDist.crossJoin(broadcast(totals))
    val gCounts = df.groupBy(qc :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__gc"))
    val spine = gCounts.select(qc: _*).distinct()
    // <=> on QI (and __s): GROUP BY treats NULL as a real group, so the
    // grid fill and the verdict join-back must match NULL QI tuples too
    // — plain === would zero-fill / drop them silently (r11 advice).
    val gcR = gCounts.select(
      qiCols.map(n => col(n).as(s"__r_$n")) :+
        col("__s").as("__rs") :+ col("__gc"): _*)
    val filled = spine.crossJoin(broadcast(gDist))
      .join(gcR,
        (qiCols.map(n => col(n) <=> col(s"__r_$n")) :+
          (col("__s") <=> col("__rs"))).reduce(_ && _), "left")
      .drop(qiCols.map(n => s"__r_$n") :+ "__rs": _*)
      .na.fill(0L, Seq("__gc"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(qc: _*).orderBy(col("__s"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(qc: _*)
    def big(c: Column): Column = c.cast("decimal(38,0)")
    val terms = filled
      .withColumn("__cumc", sum(col("__gc")).over(wOrd))
      .withColumn("__cumg", sum(col("__glc")).over(wOrd))
      .withColumn("__ng", sum(col("__gc")).over(wAll))
    val gate = terms.groupBy(qc: _*)
      .agg(
        sum(abs(big(col("__n_all")) * big(col("__cumc"))
          - big(col("__ng")) * big(col("__cumg")))).as("__num"),
        first(col("__ng")).as("group_n"),
        first(col("__n_all")).as("__nv"), first(col("__m")).as("__mv"))
      .withColumn("__den",
        big(col("group_n")) * big(col("__nv")) * big(col("__mv") - lit(1L)))
      .filter(col("__num") * lit(tDen) <= col("__den") * lit(tNum))
      .withColumn("emd",
        when(col("__den") === 0, lit(0.0))
          .otherwise(col("__num").cast("double") / col("__den").cast("double")))
      .select(qc :+ col("group_n") :+ col("emd"): _*)
    val gateR = gate.select(
      qiCols.map(n => col(n).as(s"__q_$n")) ++
        Seq(col("group_n"), col("emd")): _*)
    df.join(broadcast(gateR),
        qiCols.map(n => col(n) <=> col(s"__q_$n")).reduce(_ && _))
      .drop(qiCols.map(n => s"__q_$n"): _*)
  }

  /** l-diversity gate (Machanavajjhala et al. 2007) — the refinement
    * k-anonymity needs when a QI group is large but UNIFORM: 50 rows
    * sharing a quasi-identifier tuple pass k=3, yet if all 50 carry
    * the same sensitive value the attacker learns it without singling
    * anyone out (the homogeneity attack). Keep only rows whose QI
    * group contains at least `l` DISTINCT sensitive values.
    *
    * Plan shape: Spark windows don't support COUNT(DISTINCT), and a
    * groupBy+join-back would shuffle the corpus twice on the QI key —
    * instead the classic two-window identity on ONE exchange:
    * `dense_rank` over (QI, ORDER BY sensitive) numbers the distinct
    * sensitive values 1..d in place, and an unordered `max` over the
    * same partition broadcasts d to every row. Both window specs
    * share the QI partitioning, so Catalyst plans a single exchange
    * (one extra in-partition sort for the ranked spec).
    *
    * Output: kept rows + `distinct_sensitive` for threshold audit. */
  def lDiversityGate(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                     l: Long): DataFrame = {
    require(qiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2 (l=$l is no gate)")
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
    df.withColumn("__dr", dense_rank().over(part.orderBy(col(sensitiveCol))))
      .withColumn("distinct_sensitive", max(col("__dr")).over(part))
      .filter(col("distinct_sensitive") >= l)
      .drop("__dr")
  }

  /** 16-digit payment-card candidates: contiguous `dddddddddddddddd` or
    * the dashed/spaced 4×4 grouping. The checksum decides (see
    * [[luhnValid]]) — a bare 16-digit regex false-positives on IDs and
    * hashes constantly; Luhn rejects 90% of random digit runs, which is
    * why every DLP scanner validates before redacting. */
  val cardPattern: String =
    "\\b(?:[0-9]{16}|[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4})\\b"

  /** Luhn checksum (ISO/IEC 7812) over a 16-char digit string column:
    * from the right, double every second digit, fold >9 back by −9,
    * valid iff the sum ≡ 0 (mod 10). Pure integer higher-order array
    * expressions — exact on any engine, zero shuffle, codegen'd. */
  def luhnValid(digits16: Column): Column = {
    val terms = (1 to 16).map { i =>
      val d = ascii(substring(digits16, i, 1)) - 48
      val dbl = if ((16 - i) % 2 == 1) d * 2 else d
      when(dbl > 9, dbl - 9).otherwise(dbl)
    }
    terms.reduce(_ + _) % 10 === 0
  }

  /** Per-document card detection with checksum validation: extract all
    * [[cardPattern]] candidates, strip separators, Luhn-validate each.
    * Output: (idCol, n_candidates, n_valid) — one narrow projection,
    * the same zero-shuffle shape as [[stats]]. Redaction of validated
    * matches composes via [[redactCustom]] with `cardPattern` when a
    * caller accepts sentinel-replacing UNVALIDATED candidates too (a
    * per-match validated replace needs per-match function application;
    * same deliberate absence as pseudonymization — see object doc). */
  def cardStats(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(cardPattern), lit(0))
    val normed = transform(cands, c =>
      regexp_replace(c, lit("[- ]"), lit("")))
    docs.select(col(idCol).cast("long").as(idCol), normed.as("__cards"))
      .select(col(idCol),
        size(col("__cards")).cast("long").as("n_candidates"),
        size(filter(col("__cards"), c => luhnValid(c)))
          .cast("long").as("n_valid"))
  }
}
