package graft.core

/** Attachment link discovery — finds `hash://sha256/<hex>?type=<mime>`
  * URLs anywhere in a document: array elements, object values, object
  * KEYS, Set members, Map keys and values. Only whole-string matches
  * count — no substring scanning inside longer text.
  * (reference: library/utility/record-structure.js:9-29, pinned by
  * test/test-utility-record-structure.js:5-45)
  *
  * Populates the `links` column at write time; attachment GC is then an
  * anti-join of blob keys against `explode(links)` (SURVEY §2.2 W8).
  */
object RecordStructure {

  private val HashUrl = "^hash://sha256/([a-f0-9]{64})(\\?[a-zA-Z0-9=&\\-_.]*)?$".r

  def isHashURL(s: String): Boolean = HashUrl.matches(s)

  /** All distinct hash URLs in the value, in first-encounter order. */
  def listHashURLs(v: PoValue): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    def walk(x: PoValue): Unit = x match {
      case PoStr(s) => if (isHashURL(s)) seen += s
      case PoURL(u) => if (isHashURL(u)) seen += u
      case PoArr(items) => items.foreach(walk)
      case s: PoSet => s.items.foreach(walk)
      case PoObj(fields) =>
        fields.foreach { case (k, fv) =>
          if (isHashURL(k)) seen += k
          walk(fv)
        }
      case PoMap(entries) =>
        entries.foreach { case (k, mv) => walk(k); walk(mv) }
      case _ => ()
    }
    walk(v)
    seen.toVector
  }

  /** The 64-hex digest portion of a hash URL. */
  def hashOf(url: String): Option[String] = url match {
    case HashUrl(hex, _) => Some(hex)
    case _ => None
  }
}
