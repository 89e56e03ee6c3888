package graft.codec

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.immutable.VectorMap

import graft.core._
import graft.markup.Markup

/** HTML codec (reference: docs/api/markup.md "On HTML"): encodes ONLY
  * markup trees — arbitrary data has no obvious HTML shape, so encoding
  * non-markup errors out, exactly like the reference. Decoding parses
  * HTML5-ish documents (doctype, void elements, unquoted/quoted
  * attributes, entities, comments) into PigeonMark trees; the doctype
  * lands on the `#document` node's attrs so `decode(toHTML(x)) == x`.
  */
object HtmlCodec extends Codec {
  val handles: Seq[String] = Seq("text/html")
  val extensions: Seq[String] = Seq("html", "htm")

  def encode(v: PoValue): Array[Byte] = {
    require(Markup.getType(v).exists(t => t == "tag" || t == "document" || t == "fragment"),
      "HTML codec cannot encode arbitrary (non-markup) data")
    Markup.toHTML(v).getBytes(UTF_8)
  }

  def decode(bytes: Array[Byte]): PoValue = parse(new String(bytes, UTF_8))

  private val Void = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")
  /** elements whose text content is raw (no tag parsing inside) */
  private val RawText = Set("script", "style")

  def parse(input: String): PoValue = {
    val p = new P(input)
    val (doctype, kids) = p.document()
    val elems = kids.filterNot {
      case PoStr(s) => s.trim.isEmpty
      case _ => false
    }
    (doctype, elems) match {
      case (None, Vector(one)) if Markup.getType(one).contains("tag") => one
      case (None, many) => PoArr(PoStr("#document") +: many)
      case (Some(dt), many) =>
        PoArr(Vector(PoStr("#document"),
          PoObj("doctype" -> PoStr(dt))) ++ many)
    }
  }

  private final class P(s: String) {
    private var i = 0
    private def startsWith(t: String): Boolean = s.regionMatches(true, i, t, 0, t.length)
    private def until(t: String): String = {
      val j = s.indexOf(t, i)
      val end = if (j < 0) s.length else j
      val out = s.substring(i, end)
      i = if (j < 0) s.length else j + t.length
      out
    }

    def document(): (Option[String], Vector[PoValue]) = {
      var doctype: Option[String] = None
      if (startsWith("<!doctype")) {
        i += 9
        doctype = Some(until(">").trim)
      }
      (doctype, nodes(Nil))
    }

    /** parse siblings until a closing tag matching something on the open
      * stack (HTML recovery: an unexpected close pops implicitly). */
    def nodes(stack: List[String]): Vector[PoValue] = {
      val out = Vector.newBuilder[PoValue]
      while (i < s.length) {
        if (startsWith("</")) {
          val save = i
          i += 2
          val nm = until(">").trim.toLowerCase
          if (stack.contains(nm)) { i = save; return out.result() }
          // stray close for nothing open: drop it (browser behavior)
        } else if (startsWith("<!--")) {
          i += 4
          out += PoArr(Vector(PoStr("#comment"), PoStr(until("-->"))))
        } else if (i < s.length && s.charAt(i) == '<' && i + 1 < s.length &&
          (s.charAt(i + 1).isLetter)) {
          out += element(stack)
        } else {
          val j = s.indexOf('<', i + 1)
          val end = if (j < 0) s.length else j
          // a lone '<' not starting a tag is text
          val txt = s.substring(i, end)
          i = end
          if (txt.nonEmpty) out += PoStr(unescape(txt))
        }
      }
      out.result()
    }

    private def element(stack: List[String]): PoValue = {
      i += 1 // '<'
      val st = i
      while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
      val nm = s.substring(st, i).toLowerCase
      val attrs = Vector.newBuilder[(String, PoValue)]
      var selfClose = false
      var done = false
      while (!done && i < s.length) {
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i >= s.length) done = true
        else s.charAt(i) match {
          case '>' => i += 1; done = true
          case '/' =>
            i += 1
            if (i < s.length && s.charAt(i) == '>') { i += 1; selfClose = true; done = true }
          case _ =>
            val as = i
            while (i < s.length && !s.charAt(i).isWhitespace &&
              s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
            val an = s.substring(as, i)
            while (i < s.length && s.charAt(i).isWhitespace) i += 1
            if (i < s.length && s.charAt(i) == '=') {
              i += 1
              while (i < s.length && s.charAt(i).isWhitespace) i += 1
              val v = if (i < s.length && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
                val q = s.charAt(i); i += 1
                val vs = i
                while (i < s.length && s.charAt(i) != q) i += 1
                val out = s.substring(vs, i); i += 1; out
              } else {
                val vs = i
                while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
                s.substring(vs, i)
              }
              attrs += (an -> PoStr(unescape(v)))
            } else if (an.nonEmpty) attrs += (an -> PoStr(""))
        }
      }
      val attrMap = attrs.result()
      val head: Vector[PoValue] =
        if (attrMap.isEmpty) Vector(PoStr(nm))
        else Vector(PoStr(nm), PoObj(VectorMap.from(attrMap.map { case (k, v) => k -> v })))
      if (selfClose || Void.contains(nm)) PoArr(head)
      else if (RawText.contains(nm)) {
        val raw = until(s"</$nm>")
        PoArr(head ++ (if (raw.isEmpty) Vector.empty else Vector(PoStr(raw))))
      } else {
        val kids = nodes(nm :: stack)
        if (startsWith("</")) {
          val save = i
          i += 2
          val close = until(">").trim.toLowerCase
          if (close != nm) i = save // someone above us closes; leave it
        }
        PoArr(head ++ kids)
      }
    }

    private def unescape(t: String): String =
      if (!t.contains('&')) t
      else "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r.replaceAllIn(t, m => {
        val body = m.group(1)
        val repl = body match {
          case "lt" => "<"
          case "gt" => ">"
          case "amp" => "&"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
          case b if b.startsWith("#x") || b.startsWith("#X") =>
            Character.toChars(Integer.parseInt(b.drop(2), 16)).mkString
          case b if b.startsWith("#") =>
            Character.toChars(b.drop(1).toInt).mkString
          case _ => m.matched
        }
        scala.util.matching.Regex.quoteReplacement(repl)
      })
  }
}
