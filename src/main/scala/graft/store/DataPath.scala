package graft.store

/** URI addressing of collections and records:
  * `/{datasets|lenses|meta}/{author}:{name}` optionally followed by
  * `/records/{recordID}` (reference: library/models/codec/path.js:4-7
  * pattern, decode/encode :29-72). Lens input specs and the readPath
  * resolver both speak this form.
  */
final case class DataPath(source: String, author: String, name: String,
                          recordID: Option[String] = None) {
  // Author/name become filesystem directory components under the store
  // root, so they are validated at construction: the reference's
  // badChars (dataset.js:31-34 validateConfig) plus "." / ".." — a
  // DataPath("datasets", "..", "..") must not make Store.dir escape the
  // root, and HttpApi's route groups feed URL segments straight here.
  DataPath.checkSegment("author", author)
  DataPath.checkSegment("name", name)
  recordID.foreach(DataPath.checkRecordID)

  def collectionPath: String = s"/$source/$author:$name"
  def encoded: String = recordID match {
    case Some(r) => s"$collectionPath/records/$r"
    case None => collectionPath
  }
  def withRecord(id: String): DataPath = copy(recordID = Some(id))
}

object DataPath {
  private val Sources = Set("datasets", "lenses", "meta")

  /** The reference's forbidden name characters (dataset.js:31), plus
    * path separators and NUL which would break the directory layout. */
  private val BadChars: Set[Char] = "!*'();:@&=+$,/?%#[]\\\u0000".toSet

  private[store] def checkSegment(what: String, s: String): Unit = {
    require(s.nonEmpty, s"$what cannot be empty")
    require(s.length <= 250, s"$what must be at most 250 characters")
    require(s != "." && s != "..", s"$what must not be a relative path ($s)")
    val bad = s.filter(BadChars)
    require(bad.isEmpty,
      s"""$what must not contain ${bad.distinct.mkString("'", "' '", "'")}""")
  }

  /** Record IDs live in parquet rows, not directories, so they stay
    * permissive — but they surface as file-ish names in exports and
    * URLs, so path separators, NUL and bare "."/".." are rejected. */
  private[store] def checkRecordID(id: String): Unit = {
    require(id.nonEmpty, "recordID cannot be empty")
    require(id != "." && id != "..", s"recordID must not be a relative path ($id)")
    val bad = id.filter(c => c == '/' || c == '\\' || c == '\u0000')
    require(bad.isEmpty, "recordID must not contain path separators or NUL")
  }
  private val Pat = "^/(datasets|lenses|meta)/([^:/]+):([^:/]+)(/records/(.+))?$".r

  def parse(s: String): Option[DataPath] = s match {
    case Pat(source, author, name, _, rid) =>
      // total: an in-pattern segment that fails validation is not a
      // DataPath, same as not matching the pattern at all
      scala.util.Try(DataPath(source, author, name, Option(rid))).toOption
    case _ => None
  }

  def isSource(s: String): Boolean = Sources(s)
}
