package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Normalize}

/** q161: CONFUSABLE-SKELETON dedup under the hard signal (r15,
  * beyond-parity — the adversarial-dedup-evasion gate: documents that
  * render pixel-identically but differ byte-wise defeat exact dedup
  * unless fingerprints are taken over a confusable skeleton,
  * UTS #39 §4 in spirit).
  *
  * Fixture: three deterministic EVASION variants injected alongside
  * the corpus, each expressible identically in Spark and DuckDB —
  *  - doc_id % 9 == 4 → Cyrillic lookalikes (translate aeopcxy →
  *    аеорсху, the classic homoglyph swap);
  *  - doc_id % 9 == 7 → fullwidth forms (a-z0-9 → Ｕ+FF41…, the
  *    "ｆｕｌｌｗｉｄｔｈ" evasion);
  *  - doc_id % 9 == 2 → zero-width spaces threaded after every 'e'.
  * [[Dedup.skeletonGroups]] must fold every variant into its
  * original's group: the oracle recomputes the groups (same translate
  * tables embedded verbatim in the SQL) and pins `n_raw` — the count
  * of byte-distinct variants each skeleton absorbed — so a skeleton
  * that missed a mapping (or over-merged) breaks the hash. */
object ConfusableQuery {

  private val FwFrom = "abcdefghijklmnopqrstuvwxyz0123456789"
  private val FwTo =
    (('a' to 'z').map(c => (0xff41 + c - 'a').toChar) ++
      ('0' to '9').map(c => (0xff10 + c - '0').toChar)).mkString

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val cyr = docs.filter(col("doc_id") % 9 === 4)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        translate(col("text"), "aeopcxy", "аеорсху").as("text"))
    val fw = docs.filter(col("doc_id") % 9 === 7)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        translate(col("text"), FwFrom, FwTo).as("text"))
    val zw = docs.filter(col("doc_id") % 9 === 2)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        regexp_replace(col("text"), "e", "e​").as("text"))
    Dedup.skeletonGroups(docs.unionByName(cyr).unionByName(fw).unionByName(zw))
      .orderBy(col("fp"))
  }

  /** SQL-literal escaping for the embedded translate tables. */
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** the oracle: identical variant injection + identical skeleton
    * translate chain, tables embedded verbatim (generated — the
    * fullwidth block is 94 chars nobody should hand-type twice). */
  def oracleSql: String = {
    val fwBlockFrom = (0xff01 to 0xff5e).map(_.toChar).mkString
    val fwBlockTo = (0x21 to 0x7e).map(_.toChar).mkString
    s"""WITH alln AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, translate(text, 'aeopcxy', 'аеорсху')
       |  FROM documents WHERE doc_id % 9 = 4
       |  UNION ALL
       |  SELECT doc_id + 3000000, translate(text, ${q(FwFrom)}, ${q(FwTo)})
       |  FROM documents WHERE doc_id % 9 = 7
       |  UNION ALL
       |  SELECT doc_id + 4000000, replace(text, 'e', 'e' || chr(8203))
       |  FROM documents WHERE doc_id % 9 = 2),
       |sk AS (
       |  SELECT doc_id, text,
       |    lower(translate(translate(translate(text,
       |      ${q(fwBlockFrom)}, ${q(fwBlockTo)}),
       |      ${q(Normalize.ConfusableFrom)}, ${q(Normalize.ConfusableTo)}),
       |      ${q(Normalize.InvisibleChars)}, '')) AS skel
       |  FROM alln)
       |SELECT
       |  sha256(substring(regexp_replace(skel, '[^a-z0-9]+', ' ', 'g'), 1, 100)) AS fp,
       |  count(*) AS n_docs, min(doc_id) AS keep_id,
       |  count(DISTINCT sha256(substring(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), 1, 100))) AS n_raw
       |FROM sk GROUP BY 1 ORDER BY fp""".stripMargin
  }
}
