package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codec.HtmlCodec
import graft.core.{PoStr, PoValue}
import graft.markup.Markup

/** HTML main-content extraction — the boilerplate-removal stage of a
  * web-crawl pipeline: crawled pages are mostly chrome (nav, headers,
  * footers, cookie banners); training corpora want the article text.
  *
  * This runs the engine's OWN production HTML machinery at corpus
  * scale: `HtmlCodec.parse` (the S13 codec, same class the REST layer
  * uses) builds the PigeonMark tree and `Markup.select` / `Markup.text`
  * (§2.7, the functions lens sandboxes see) pull the content — so the
  * operator is simultaneously the web-curation stage and a scale test
  * of the markup engine.
  *
  * Extraction strategy is selector-first with a density fallback:
  *
  *   1. If any node matches `contentSelector` (default
  *      `"main, article, #main, #content"` — the a11y/readability
  *      convention), the FIRST match's textContent wins.
  *   2. Otherwise fall back to the densest block: the `<p>/<div>/<td>`
  *      subtree with the longest direct textContent (a one-pass
  *      text-density heuristic, the readability-algorithm core).
  *
  * Shape: `mapPartitions` — parsing is genuinely non-expression work
  * (same argument as [[Multimodal]]); one parser invocation per row,
  * rows streamed, no per-partition state beyond the code itself. At
  * 100 TB this is embarrassingly parallel: no shuffle, output is a
  * narrow (id, text, counts) projection feeding the text pipeline
  * ([[Normalize]] → [[TextOps]] → [[Dedup]]).
  */
object HtmlExtract {

  val defaultContentSelector = "main, article, #main, #content"

  /** Pure extraction core (also the unit-test surface): html → (main
    * text, n_links, title). Parse failures yield ("", 0, "") — a
    * malformed crawl page is dropped by the downstream quality gate,
    * never a job failure. */
  def extract(html: String,
              contentSelector: String = defaultContentSelector): (String, Int, String) =
    try {
      val tree = HtmlCodec.parse(html)
      val title = Markup.select(tree, "title").headOption
        .map(Markup.text).getOrElse("")
      val nLinks = Markup.select(tree, "a").size
      val main = Markup.select(tree, contentSelector).headOption match {
        case Some(node) => Markup.text(node)
        case None =>
          val blocks = Markup.select(tree, "p, div, td")
          if (blocks.isEmpty) Markup.text(tree)
          else {
            // Densest block in ONE post-order pass (VERDICT r5 #3): the
            // old blocks.map(Markup.text).maxBy assembled the full
            // subtree text of every nested match — O(depth * n) string
            // work on pathologically nested crawl pages. Here each
            // node's subtree text LENGTH is computed once bottom-up
            // (identity-keyed: equal-but-distinct subtrees must not
            // collide), and text is assembled only for the winner.
            // maxBy keeps the first maximum, matching the old
            // document-order tie-break exactly.
            val len = new java.util.IdentityHashMap[PoValue, java.lang.Long]()
            def walk(n: PoValue): Long = n match {
              case PoStr(s) => s.length.toLong
              case node =>
                val l = Markup.getType(node) match {
                  case Some("comment") | Some("pi") => 0L
                  case Some("cdata") =>
                    Markup.childNodes(node)
                      .collect { case PoStr(s) => s.length.toLong }.sum
                  case _ => Markup.childNodes(node).map(walk).sum
                }
                len.put(node, l)
                l
            }
            walk(tree)
            val best = blocks.maxBy { b =>
              val l = len.get(b)
              if (l == null) Markup.text(b).length.toLong else l.longValue
            }
            Markup.text(best)
          }
      }
      (main, nLinks, title)
    } catch { case scala.util.control.NonFatal(_) => ("", 0, "") }

  /** (id, html) → (id, main_text, n_links, title). */
  def mainContent(df: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html",
                  contentSelector: String = defaultContentSelector): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sel = contentSelector
    df.select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, html) =>
          val (main, nLinks, title) = extract(html, sel)
          (id, main, nLinks, title)
        }
      }
      .toDF(idCol, "main_text", "n_links", "title")
  }
}
