package graft.core

/** Attachment link discovery — finds `hash://sha256/<hex>?<query>` URLs
  * anywhere in a document: array elements, object values, object KEYS,
  * Set members, Map keys and values. Matches the reference's regex
  * `/^hash:\/\/sha256\/([a-f0-9]{64})\?([^#?]*)$/im` exactly
  * (library/utility/record-structure.js:22): case-insensitive, anchored
  * per LINE (a URL on its own line inside a longer text matches), query
  * string required. The hex digest is lowercased in the discovered link
  * (the reference normalizes via toLowerCase, :24-26); the query is kept
  * as written.
  *
  * Populates the `links` column at write time; attachment GC is then an
  * anti-join of blob keys against `explode(links)` (SURVEY §2.2 W8).
  */
object RecordStructure {

  private val HashUrl =
    "(?im)^hash://sha256/([a-fA-F0-9]{64})\\?([^#?\\r\\n]*)$".r

  def isHashURL(s: String): Boolean = findHashURL(s).isDefined

  /** First hash URL in the string (per line anchoring), normalized. */
  def findHashURL(s: String): Option[String] =
    HashUrl.findFirstMatchIn(s).map(m => s"hash://sha256/${m.group(1).toLowerCase}?${m.group(2)}")

  /** All distinct hash URLs in the value, in first-encounter order. */
  def listHashURLs(v: PoValue): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    def add(s: String): Unit = findHashURL(s).foreach(seen += _)
    def walk(x: PoValue): Unit = x match {
      case PoStr(s) => add(s)
      case PoURL(u) => add(u)
      case PoArr(items) => items.foreach(walk)
      case s: PoSet => s.items.foreach(walk)
      case PoObj(fields) =>
        fields.foreach { case (k, fv) =>
          add(k)
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
  def hashOf(url: String): Option[String] =
    HashUrl.findFirstMatchIn(url).map(_.group(1).toLowerCase)
}
