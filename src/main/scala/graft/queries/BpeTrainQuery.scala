package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.ops.TextOps

/** q158: BPE tokenizer TRAINING under the hard signal (r15 — VERDICT
  * r14 next #5, the missing middle of the tokenizer family: q88 gives
  * the first iteration's pair statistic, q95 applies a learned table,
  * this LEARNS one). [[TextOps.bpeTrain]] runs the Sennrich et al.
  * 2016 loop over the documents corpus — driver-side iteration,
  * executor-side vocabulary-bounded counting, a 1-row collect per
  * merge (the selection IS the model), never a corpus-sized shuffle
  * per iteration — and the query emits the learned table itself:
  * (rank, lhs, rhs, weighted occurrence count at selection time,
  * weighted total vocabulary tokens after the merge). The trajectory
  * column pins every INTERMEDIATE segmentation state, so a wrong
  * greedy-overlap rule, a tie-break inversion, or a stale-count merge
  * breaks the hash even when the final table happens to agree.
  *
  * The DuckDB oracle replays the identical training: the same char
  * segmentation as positional rows, then [[oracleSql]] UNROLLS each
  * iteration into plain SQL — pair counts over adjacent positions,
  * top-1 by (count DESC, pair ASC), and the left-to-right
  * non-overlapping merge expressed with gaps-and-islands windows (a
  * run of consecutive matches — only possible when lhs == rhs —
  * merges at its 1st, 3rd, … positions). Generated programmatically
  * so each of the [[NMerges]] stages is byte-identical in structure.
  *
  * BpeTrainSpec holds the property check the verdict asked for:
  * encoding the vocabulary through q95's [[TextOps.bpeEncodeVocab]]
  * path with the learned table reproduces the training segmentation
  * exactly (the min-rank ≡ training-order equivalence that holds for
  * tables produced by training, by construction). */
object BpeTrainQuery {

  val NMerges = 8

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val (merges, seg) = TextOps.bpeTrain(docs, NMerges)
    seg.unpersist() // the query pins the table + trajectory, not the seg
    merges.zipWithIndex.map { case ((a, b, n, vt), i) =>
      ((i + 1).toLong, a, b, n, vt)
    }.toDF("rank", "lhs", "rhs", "n_occurrences", "vocab_tokens_after")
      .orderBy("rank")
  }

  /** The unrolled training replay (see object doc). One CTE chain:
    * seg0 = char rows; per stage k — pc (adjacent-pair counts), m
    * (top-1 selection), a (match flags via lead), g (match-run
    * islands), s (greedy 1st/3rd/… starts), f (consumed flags via
    * lag), seg{k} (merged rows, positions re-ranked). */
  def oracleSql: String = {
    val sb = new StringBuilder
    sb ++=
      """WITH w AS (
        |  SELECT u.tok AS word, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents d,
        |       unnest(string_split_regex(lower(d.text), '[^a-z0-9]+')) AS u(tok)
        |  WHERE u.tok <> '' GROUP BY u.tok),
        |seg0 AS MATERIALIZED (
        |  SELECT word, cnt, CAST(i AS BIGINT) AS pos, substring(word, i, 1) AS tok
        |  FROM w, UNNEST(range(1, length(word) + 1)) AS r(i))""".stripMargin
    (1 to NMerges).foreach { k =>
      val prev = s"seg${k - 1}"
      sb ++= s""",
        |pc$k AS MATERIALIZED (
        |  SELECT s.tok AS a, t.tok AS b, CAST(sum(s.cnt) AS BIGINT) AS n
        |  FROM $prev s JOIN $prev t ON t.word = s.word AND t.pos = s.pos + 1
        |  GROUP BY s.tok, t.tok),
        |m$k AS MATERIALIZED (SELECT a, b, n FROM pc$k ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |a$k AS MATERIALIZED (
        |  SELECT s.word, s.cnt, s.pos, s.tok,
        |    lead(s.tok) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt,
        |    COALESCE(s.tok = m.a AND
        |      lead(s.tok) OVER (PARTITION BY s.word ORDER BY s.pos) = m.b,
        |      FALSE) AS mat
        |  FROM $prev s CROSS JOIN m$k m),
        |g$k AS MATERIALIZED (
        |  SELECT *, CASE WHEN mat THEN
        |      pos - row_number() OVER (PARTITION BY word, mat ORDER BY pos)
        |    END AS grp
        |  FROM a$k),
        |s$k AS MATERIALIZED (
        |  SELECT *, COALESCE(mat AND
        |      ((pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0),
        |      FALSE) AS strt
        |  FROM g$k),
        |f$k AS MATERIALIZED (
        |  SELECT *, lag(strt) OVER (PARTITION BY word ORDER BY pos) AS pstrt
        |  FROM s$k),
        |seg$k AS MATERIALIZED (
        |  SELECT word, cnt,
        |    CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
        |    CASE WHEN strt THEN tok || nxt ELSE tok END AS tok
        |  FROM f$k WHERE NOT COALESCE(pstrt, FALSE))""".stripMargin
    }
    sb ++= "\nSELECT * FROM (\n"
    sb ++= (1 to NMerges).map { k =>
      s"""  SELECT CAST($k AS BIGINT) AS rank, m.a AS lhs, m.b AS rhs,
         |    m.n AS n_occurrences,
         |    (SELECT CAST(sum(cnt) AS BIGINT) FROM seg$k) AS vocab_tokens_after
         |  FROM m$k m""".stripMargin
    }.mkString("\n  UNION ALL\n")
    sb ++= "\n) ORDER BY rank"
    sb.result()
  }
}
