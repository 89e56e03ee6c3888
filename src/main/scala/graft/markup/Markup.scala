package graft.markup

import scala.collection.immutable.VectorMap

import graft.core._

/** JsonML/PigeonMark markup trees over [[PoValue]] — the DOM-ish utility
  * surface lenses get as `Markup` (reference:
  * library/workers/environment.js/markup.js:1-35, API doc
  * docs/api/markup.md:44-106, behavior pinned by
  * test/test-workers-javascript-environment.js:6-60 / FIXTURES.md F7).
  *
  * Node shapes (all plain document values, so markup flows through
  * datasets/lenses/codecs like any data):
  *   tag       ["name", {attrs}?, ...children]
  *   text      "string"
  *   document  ["#document", {doctype?}, ...children]
  *   comment   ["#comment", "text"]   cdata ["#cdata-section", "text"]
  *   fragment  ["#fragment", ...]     pi   ["?name", {attrs}]
  */
object Markup {

  private val NamePat = "^[A-Za-z_][A-Za-z0-9_.:-]*$".r

  def getType(node: PoValue): Option[String] = node match {
    case _: PoStr => Some("text")
    case PoObj(_) => Some("attributes")
    case PoArr(items) if items.nonEmpty =>
      items.head match {
        case PoStr("#document") => Some("document")
        case PoStr("#comment") => Some("comment")
        case PoStr("#cdata-section") => Some("cdata")
        case PoStr("#fragment") => Some("fragment")
        case PoStr(n) if n.startsWith("?") => Some("pi")
        case PoStr(n) if NamePat.matches(n) => Some("tag")
        case _ => None
      }
    case _ => None
  }

  def isPigeonMark(node: PoValue): Boolean = getType(node).isDefined

  def name(node: PoValue): Option[String] = node match {
    case PoArr(items) if items.nonEmpty =>
      items.head match {
        case PoStr(n) if n.startsWith("?") => Some(n.drop(1))
        case PoStr(n) => Some(n)
        case _ => None
      }
    case _ => None
  }

  /** Rename a tag or processing instruction (F7:
    * `Markup.get.name(['?xml', ...], 'xml-stylesheet')` ⇒
    * `['?xml-stylesheet', ...]`). */
  def setName(node: PoValue, newName: String): PoValue = node match {
    case PoArr(items) if items.nonEmpty =>
      items.head match {
        case PoStr(old) if old.startsWith("?") =>
          PoArr(PoStr("?" + newName) +: items.tail)
        case PoStr(_) => PoArr(PoStr(newName) +: items.tail)
        case _ => node
      }
    case other => other
  }

  def attributes(node: PoValue): VectorMap[String, String] = node match {
    case PoArr(items) if items.length >= 2 =>
      items(1) match {
        case PoObj(fields) =>
          VectorMap.from(fields.collect { case (k, PoStr(v)) => k -> v })
        case _ => VectorMap.empty
      }
    case _ => VectorMap.empty
  }

  def setAttributes(node: PoValue, attrs: Map[String, String]): PoValue = node match {
    case PoArr(items) if items.nonEmpty =>
      val attrObj = PoObj(VectorMap.from(attrs.map { case (k, v) => k -> (PoStr(v): PoValue) }))
      val hasAttrs = items.length >= 2 && items(1).isInstanceOf[PoObj]
      val kids = if (hasAttrs) items.drop(2) else items.drop(1)
      PoArr(items.head +: attrObj +: kids)
    case other => other
  }

  def attribute(node: PoValue, attr: String): Option[String] =
    attributes(node).get(attr)

  def setAttribute(node: PoValue, attr: String, v: String): PoValue =
    setAttributes(node, attributes(node).updated(attr, v))

  def id(node: PoValue): Option[String] = attribute(node, "id")
  def setId(node: PoValue, v: String): PoValue = setAttribute(node, "id", v)

  def classList(node: PoValue): Seq[String] =
    attribute(node, "class").map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
  def setClassList(node: PoValue, cls: Seq[String]): PoValue =
    setAttribute(node, "class", cls.mkString(" "))

  /** All child nodes including text/comments/cdata, in order. */
  def childNodes(node: PoValue): Vector[PoValue] = node match {
    case PoArr(items) if items.nonEmpty =>
      val skip = if (items.length >= 2 && items(1).isInstanceOf[PoObj]) 2 else 1
      items.drop(skip)
    case _ => Vector.empty
  }

  def setChildNodes(node: PoValue, kids: Seq[PoValue]): PoValue = node match {
    case PoArr(items) if items.nonEmpty =>
      val keep = if (items.length >= 2 && items(1).isInstanceOf[PoObj]) items.take(2) else items.take(1)
      PoArr(keep ++ kids)
    case other => other
  }

  /** Child TAG nodes only (skips text, comments, cdata). */
  def children(node: PoValue): Vector[PoValue] =
    childNodes(node).filter(n => getType(n).contains("tag"))

  /** textContent: all descendant text nodes concatenated. */
  def text(node: PoValue): String = node match {
    case PoStr(s) => s
    case n => getType(n) match {
      case Some("comment") | Some("pi") => ""
      case Some("cdata") => childNodes(n).collect { case PoStr(s) => s }.mkString
      case _ => childNodes(n).map(text).mkString
    }
  }

  def setText(node: PoValue, s: String): PoValue = setChildNodes(node, Seq(PoStr(s)))

  // ------------------------------------------------------- css selector

  /** CSS select over the tree (reference uses `tree-selector`): supports
    * tag, #id, .class, [attr], [attr=val], compound simple selectors,
    * descendant (space) and child (>) combinators, and comma groups.
    * Returns matches in document order. */
  def select(root: PoValue, selector: String): Vector[PoValue] = {
    val groups = selector.split(",").map(_.trim).filter(_.nonEmpty)
    val all = allTagsWithAncestry(root)
    val out = all.collect {
      case (node, ancestors) if groups.exists(g => matchesComplex(node, ancestors, g)) => node
    }
    out
  }

  /** Parse-time validation of a selector string: Right(()) iff every
    * comma group tokenizes into alternating compounds and combinators
    * (no leading/trailing/double combinator) and every compound is
    * built from the supported simple selectors (tag, #id, .class,
    * [attr], [attr=val], *). The MATCH path stays lenient — a malformed
    * compound simply never matches — but a wire boundary (MapDsl's
    * 'select') uses this to reject garbage with a 400 at parse time
    * instead of silently returning an empty index. */
  def validateSelector(selector: String): Either[String, Unit] = {
    val groups = selector.split(",").map(_.trim)
    if (groups.forall(_.isEmpty)) return Left("empty selector")
    groups.filter(_.nonEmpty).foldLeft[Either[String, Unit]](Right(())) { (acc, g) =>
      acc.flatMap { _ =>
        val toks = tokenizeSelector(g)
        if (toks.isEmpty) Left(s"empty selector group in '$selector'")
        else if (toks.last == ">" || toks.last == " ")
          Left(s"selector group '$g' ends with a combinator")
        else {
          val structureOk = toks.zipWithIndex.forall { case (t, i) =>
            if (i % 2 == 0) t != ">" && t != " " else t == ">" || t == " "
          }
          if (!structureOk) Left(s"selector group '$g' has misplaced combinators")
          else toks.zipWithIndex.collectFirst {
            case (t, i) if i % 2 == 0 && !compoundWellFormed(t) =>
              Left(s"unsupported simple selector in '$t'"): Either[String, Unit]
          }.getOrElse(Right(()))
        }
      }
    }
  }

  private val SimpleSelector =
    "([a-zA-Z*][a-zA-Z0-9_-]*)|(#[^#.\\[]+)|(\\.[^#.\\[]+)|(\\[[^\\]]+\\])".r

  private def compoundWellFormed(compound: String): Boolean =
    SimpleSelector.findAllIn(compound).mkString == compound && compound.nonEmpty

  /** depth-first (document order) list of (tag, ancestorsNearestFirst) */
  private def allTagsWithAncestry(root: PoValue): Vector[(PoValue, List[PoValue])] = {
    val buf = Vector.newBuilder[(PoValue, List[PoValue])]
    def walk(n: PoValue, anc: List[PoValue]): Unit = {
      val t = getType(n)
      if (t.contains("tag")) buf += ((n, anc))
      if (t.exists(x => x == "tag" || x == "document" || x == "fragment"))
        childNodes(n).foreach(walk(_, n :: anc))
    }
    walk(root, Nil)
    buf.result()
  }

  private def matchesComplex(node: PoValue, ancestors: List[PoValue], sel: String): Boolean = {
    // parse right-to-left: compound (combinator compound)*
    val toks = tokenizeSelector(sel)
    def m(node: PoValue, ancestors: List[PoValue], idx: Int): Boolean = {
      if (!matchesCompound(node, toks(idx))) return false
      if (idx == 0) return true
      toks(idx - 1) match {
        case ">" =>
          ancestors.nonEmpty && m(ancestors.head, ancestors.tail, idx - 2)
        case " " =>
          ancestors.tails.exists {
            case a :: rest => m(a, rest, idx - 2)
            case Nil => false
          }
        case other => matchesCompound(node, other) // malformed; treat as no-op
      }
    }
    m(node, ancestors, toks.length - 1)
  }

  /** tokenize into compound selectors and combinators: "a > b c" →
    * [a, >, b, " ", c] */
  private def tokenizeSelector(sel: String): Vector[String] = {
    val parts = sel.replace(">", " > ").split("\\s+").filter(_.nonEmpty)
    val toks = Vector.newBuilder[String]
    var expectCompound = true
    parts.foreach { p =>
      if (p == ">") { toks += ">"; expectCompound = true }
      else {
        if (!expectCompound) toks += " "
        toks += p
        expectCompound = false
      }
    }
    toks.result()
  }

  private def matchesCompound(node: PoValue, compound: String): Boolean = {
    if (!getType(node).contains("tag")) return false
    // split compound into simple selectors: tag, #id, .class, [attr...]
    val simples = SimpleSelector.findAllIn(compound).toList
    if (simples.isEmpty || simples.mkString != compound) return false
    simples.forall {
      case s if s.startsWith("#") => id(node).contains(s.drop(1))
      case s if s.startsWith(".") => classList(node).contains(s.drop(1))
      case s if s.startsWith("[") =>
        val body = s.stripPrefix("[").stripSuffix("]")
        body.split("=", 2) match {
          case Array(a) => attribute(node, a.trim).isDefined
          case Array(a, v) =>
            attribute(node, a.trim).contains(v.trim.stripPrefix("\"").stripSuffix("\"")
              .stripPrefix("'").stripSuffix("'"))
        }
      case "*" => true
      case tag => name(node).contains(tag)
    }
  }

  // ------------------------------------------------------ serialization

  private def escapeText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def escapeAttr(s: String): String =
    escapeText(s).replace("\"", "&quot;")

  /** W3C XML 1.0 serialization: quoted attributes, self-closing empty
    * tags (F7: toXML(['root',['div',{id:'yeah'},'no'],['span','cool']])
    * == <root><div id="yeah">no</div><span>cool</span></root>). */
  def toXML(node: PoValue): String = {
    val sb = new StringBuilder
    def w(n: PoValue): Unit = getType(n) match {
      case Some("text") => sb.append(escapeText(n.asInstanceOf[PoStr].s))
      case Some("comment") => sb.append("<!--").append(text0(n)).append("-->")
      case Some("cdata") => sb.append("<![CDATA[").append(text0(n)).append("]]>")
      case Some("pi") =>
        sb.append("<?").append(name(n).get)
        attributes(n).foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(escapeAttr(v)).append('"') }
        sb.append("?>")
      case Some("document") =>
        // the reference round-trips the doctype through XML output too
        // (test-workers-javascript-environment.js:111-113: toXML of the
        // golden html document equals its source text)
        attribute(n, "doctype").foreach(d => sb.append(s"<!DOCTYPE $d>\n"))
        childNodes(n).foreach(w)
      case Some("fragment") => childNodes(n).foreach(w)
      case Some("tag") =>
        val nm = name(n).get
        sb.append('<').append(nm)
        attributes(n).foreach { case (k, v) =>
          sb.append(' ').append(k).append("=\"").append(escapeAttr(v)).append('"')
        }
        val kids = childNodes(n)
        if (kids.isEmpty) sb.append("/>")
        else {
          sb.append('>')
          kids.foreach(w)
          sb.append("</").append(nm).append('>')
        }
      case other => throw new IllegalArgumentException(s"not a markup node: $n ($other)")
    }
    w(node)
    sb.toString
  }

  private def text0(n: PoValue): String =
    childNodes(n).collect { case PoStr(s) => s }.mkString

  /** HTML void elements (no closing tag, may not have children). */
  private val VoidElems = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** Can this attribute value go unquoted in HTML5? */
  private def unquotable(v: String): Boolean =
    v.nonEmpty && !v.exists(c => c.isWhitespace || "\"'=<>`&".contains(c))

  /** WHATWG HTML5 serialization, compact: unquoted attribute values
    * where legal, void elements, doctype from the #document node's
    * attrs (F7 pins `<!DOCTYPE html>\n<html><div id=yeah>no</div>...`). */
  def toHTML(node: PoValue): String = {
    val sb = new StringBuilder
    def w(n: PoValue): Unit = getType(n) match {
      case Some("text") => sb.append(escapeText(n.asInstanceOf[PoStr].s))
      case Some("comment") => sb.append("<!--").append(text0(n)).append("-->")
      case Some("cdata") => sb.append(escapeText(text0(n)))
      case Some("pi") => () // not representable in html output
      case Some("document") =>
        attribute(n, "doctype").foreach(d => sb.append(s"<!DOCTYPE $d>\n"))
        childNodes(n).foreach(w)
      case Some("fragment") => childNodes(n).foreach(w)
      case Some("tag") =>
        val nm = name(n).get
        sb.append('<').append(nm)
        attributes(n).foreach { case (k, v) =>
          sb.append(' ').append(k)
          if (v.nonEmpty) {
            sb.append('=')
            if (unquotable(v)) sb.append(v)
            else sb.append('"').append(escapeAttr(v)).append('"')
          }
        }
        sb.append('>')
        val kids = childNodes(n)
        if (VoidElems.contains(nm.toLowerCase)) {
          require(kids.isEmpty, s"void element <$nm> cannot have children")
        } else {
          kids.foreach(w)
          sb.append("</").append(nm).append('>')
        }
      case other => throw new IllegalArgumentException(s"not a markup node: $n ($other)")
    }
    w(node)
    sb.toString
  }
}
