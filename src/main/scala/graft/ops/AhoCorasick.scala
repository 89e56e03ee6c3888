package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** MULTI-PATTERN BLOCKLIST MATCHING via Aho–Corasick (round 14) — the
  * curation gate every training-data pipeline runs: flag documents
  * containing any of a (possibly large) list of banned/suspect
  * phrases, with counts and positions, in ONE scan-stage pass.
  *
  * Why an automaton and not the obvious alternatives, at 100 TB:
  *  - per-phrase `contains` passes scan the corpus |phrases| times;
  *  - a phrase⨝shingle join shuffles corpus-sized gram tables and only
  *    works for fixed-length phrases;
  *  - Aho–Corasick walks each document ONCE — O(chars + matches)
  *    regardless of phrase count — and the automaton (≈ total phrase
  *    chars) rides the closure/broadcast to every executor.
  * The pass is mapPartitions over the doc scan with ZERO shuffles
  * before the final presentation sort; matches INCLUDING overlapping
  * occurrences are reported (every end position fires, the classic AC
  * output-link semantics — the oracle counts positions, so an
  * automaton that missed overlaps or suffix matches breaks the hash).
  *
  * Classic construction (Aho & Corasick 1975, CACM 18(6)): a goto
  * trie over the phrase set, BFS failure links, and output links
  * collapsing each node's matched-suffix set. Matching is EXACT
  * (case-sensitive): normalize text and phrases upstream (the q50
  * normalize pass) — folding inside the matcher would re-open the
  * Java-vs-SQL case-mapping divergence class for no gain. */
object AhoCorasick {

  /** Compact serializable automaton: per-node HashMap transitions +
    * fail/output arrays. Built once (driver or test), shipped by
    * closure capture — sum-of-phrase-chars nodes, independent of the
    * corpus. */
  final class Automaton private[AhoCorasick] (
      private[AhoCorasick] val trans: Array[java.util.HashMap[Character, Integer]],
      private[AhoCorasick] val fail: Array[Int],
      /** phrase ids ending at this node (own + via output links, pre-collapsed) */
      private[AhoCorasick] val out: Array[Array[Int]],
      val phrases: Array[String]) extends Serializable {

    /** all matches in `text` as (phraseId, 1-based END position).
      * Positions count CODE POINTS, not UTF-16 units (ADVICE r14): the
      * automaton still transitions per char — a surrogate PAIR walks as
      * two edges, which preserves exactness — but the reported position
      * only advances when the char is not the low half of a pair, so
      * astral text (emoji, rare CJK) agrees with the DuckDB oracle's
      * substring/length math. A phrase can never end between the halves
      * of a pair: its own low-surrogate tail edge advanced past both. */
    def matches(text: String): Iterator[(Int, Int)] = new Iterator[(Int, Int)] {
      private var state = 0
      private var i = 0
      private var pending: Array[Int] = Array.emptyIntArray
      private var pi = 0
      private var pos = 0 // code points consumed so far
      private def advance(): Unit = {
        while (pi >= pending.length && i < text.length) {
          val c = text.charAt(i)
          var s = state
          var n = trans(s).get(c)
          while (n == null && s != 0) { s = fail(s); n = trans(s).get(c) }
          state = if (n == null) 0 else n.intValue()
          // a low surrogate PAIRED with the previous char is the same
          // code point; an unpaired one is its own (lenient-WTF16, like
          // codePointCount)
          if (!(Character.isLowSurrogate(c) && i > 0 &&
                Character.isHighSurrogate(text.charAt(i - 1))))
            pos += 1
          i += 1
          pending = out(state)
          pi = 0
        }
      }
      def hasNext: Boolean = { advance(); pi < pending.length }
      def next(): (Int, Int) = { val r = (pending(pi), pos); pi += 1; r }
    }
  }

  /** Build the automaton from a phrase list (empty phrases dropped;
    * duplicates keep the FIRST id). Exact-match (no case folding). */
  def build(phrases: Seq[String]): Automaton = {
    val ps = phrases.toArray
    val trans = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // goto trie
    ps.zipWithIndex.foreach { case (p, id) =>
      if (p.nonEmpty) {
        var s = 0
        p.foreach { c =>
          val n = trans(s).get(c)
          s = if (n != null) n.intValue()
          else {
            trans += new java.util.HashMap[Character, Integer]()
            ownOut += Nil
            trans(s).put(c, trans.length - 1)
            trans.length - 1
          }
        }
        // duplicates keep the FIRST id: distinct phrases never share a
        // terminal node, so a non-empty slot here means this exact
        // phrase was already registered (review find r14 — checking
        // for the NEW id could never dedup)
        if (ownOut(s).isEmpty) ownOut(s) = List(id)
      }
    }
    // BFS failure links + collapsed output sets
    val n = trans.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ownOut(0).toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    trans(0).forEach { (_, v) =>
      fail(v) = 0
      queue += v.intValue()
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = (ownOut(s) ++ out(fail(s)).toList).distinct.toArray
      trans(s).forEach { (c, v) =>
        var f = fail(s)
        var t = trans(f).get(c)
        while (t == null && f != 0) { f = fail(f); t = trans(f).get(c) }
        fail(v.intValue()) = if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        queue += v.intValue()
      }
    }
    new Automaton(trans.toArray, fail, out, ps)
  }

  /** The blocklist pass: per (doc, matched phrase) — occurrence count
    * (overlaps included) and the first match's 1-based START position.
    * Docs with no matches emit nothing. One mapPartitions pass, no
    * shuffle before the final aggregation on (doc, phrase) — which is
    * match-sized, not corpus-sized. */
  def blocklistMatches(docs: DataFrame, phrases: Seq[String],
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ac = build(phrases) // closure-captured: phrase-sized, corpus-independent
    // start arithmetic in CODE POINTS, matching matches()'s positions
    val cpLen = ac.phrases.map(p => p.codePointCount(0, p.length))
    val hits: Dataset[(Long, Int, Int)] = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = Option(text).getOrElse("")
        ac.matches(t).map { case (pid, end) =>
          (id, pid, end - cpLen(pid) + 1) // 1-based start
        }
      }
    hits.toDF(idCol, "pid", "start")
      .groupBy(col(idCol), col("pid"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
      .withColumn("phrase",
        element_at(typedLit(ac.phrases.toSeq), col("pid") + 1))
      .select(col(idCol), col("phrase"), col("n_matches"),
        col("first_pos").cast("long").as("first_pos"))
  }
}
