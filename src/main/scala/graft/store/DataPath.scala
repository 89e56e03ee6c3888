package graft.store

/** URI addressing of collections and records:
  * `/{datasets|lenses|meta}/{author}:{name}` optionally followed by
  * `/records/{recordID}` (reference: library/models/codec/path.js:4-7
  * pattern, decode/encode :29-72). Lens input specs and the readPath
  * resolver both speak this form.
  */
final case class DataPath(source: String, author: String, name: String,
                          recordID: Option[String] = None) {
  def collectionPath: String = s"/$source/$author:$name"
  def encoded: String = recordID match {
    case Some(r) => s"$collectionPath/records/$r"
    case None => collectionPath
  }
  def withRecord(id: String): DataPath = copy(recordID = Some(id))
}

object DataPath {
  private val Sources = Set("datasets", "lenses", "meta")
  private val Pat = "^/(datasets|lenses|meta)/([^:/]+):([^:/]+)(/records/(.+))?$".r

  def parse(s: String): Option[DataPath] = s match {
    case Pat(source, author, name, _, rid) =>
      Some(DataPath(source, author, name, Option(rid)))
    case _ => None
  }

  def isSource(s: String): Boolean = Sources(s)
}
