package graft.store

import java.net.{URLDecoder, URLEncoder}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.core._

/** Content-addressed attachment blob store (reference:
  * library/models/attachments.js): blobs keyed by sha256 hex, referenced
  * from documents via `hash://sha256/<hex>?type=<mime>` strings, garbage
  * collected by an anti-join of stored blob keys against every
  * collection's `links` column (reference attachments.js:161-195 — the
  * reference re-scans linking records; with links as a COLUMN the scan
  * is a column-pruned parquet read).
  */
final class AttachmentStore(store: Store) {

  private def root: Path = Paths.get(store.root, "attachments")

  private def pathFor(hex: String): Path = {
    require(hex.length == 64 && hex.forall(c => "0123456789abcdef".contains(c)),
      s"bad attachment hash: $hex")
    root.resolve(hex.substring(0, 2)).resolve(hex)
  }

  def sha256hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(bytes)
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Store a blob, returning its hash (idempotent). Written to a temp
    * file then atomically renamed — same commit discipline as snapshots. */
  def write(bytes: Array[Byte]): String = {
    val hex = sha256hex(bytes)
    val p = pathFor(hex)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    hex
  }

  def has(hex: String): Boolean = Files.exists(pathFor(hex))
  def read(hex: String): Option[Array[Byte]] =
    if (has(hex)) Some(Files.readAllBytes(pathFor(hex))) else None

  /** The canonical URL form for a stored blob. */
  def url(hex: String, mime: String): String =
    s"hash://sha256/$hex?type=${URLEncoder.encode(mime, "UTF-8")}"

  def list(): Seq[String] =
    if (!Files.isDirectory(root)) Seq.empty
    else Files.list(root).iterator().asScala.filter(Files.isDirectory(_))
      .flatMap(d => Files.list(d).iterator().asScala)
      .map(_.getFileName.toString).filter(_.length == 64).toSeq.sorted

  /** GC: delete blobs referenced by no record in any collection.
    * links scan = union of column-pruned `links` reads over every
    * dataset and lens snapshot → explode → distinct; blob inventory
    * anti-joins it (SURVEY §2.2 W8). Returns the deleted hashes. */
  def gc(): Seq[String] = {
    val spark = store.spark
    import spark.implicits._
    val collections = for {
      source <- Seq("datasets", "lenses")
      author <- store.listAuthors(source)
      name <- store.listCollections(source, author)
    } yield store.collection(source, author, name)
    val live: Set[String] =
      if (collections.isEmpty) Set.empty
      else collections.map(_.toDF.select(explode(col("links")).as("l")))
        .reduce(_ unionByName _)
        .select(regexp_extract(col("l"), "hash://sha256/([a-f0-9]{64})", 1).as("h"))
        .distinct().as[String].collect().toSet
    val dead = list().filterNot(live)
    dead.foreach(h => Files.deleteIfExists(pathFor(h)))
    dead
  }

  /** cid:→hash:// deep rewrite at ingest (reference:
    * record-structure.js:44-72 resolveContentIDs): whole strings starting
    * `cid:` resolve through the uploaded-files map to their content URL;
    * an unknown content id rejects the write. */
  def resolveContentIDs(v: PoValue, files: Map[String, (String, String)]): PoValue = {
    def resolveStr(s: String): String =
      if (s.length >= 4 && s.substring(0, 4).equalsIgnoreCase("cid:")) {
        val cid = URLDecoder.decode(s.substring(4), "UTF-8")
        files.get(cid) match {
          case Some((hex, mime)) => url(hex, mime)
          case None => throw new IllegalArgumentException(
            s"File URLs reference missing attachments: $s")
        }
      } else s
    def walk(x: PoValue): PoValue = x match {
      case PoStr(s) => PoStr(resolveStr(s))
      case PoArr(items) => PoArr(items.map(walk))
      case s: PoSet => PoSet.fromSeq(s.items.map(walk))
      case PoObj(fields) =>
        PoObj(scala.collection.immutable.VectorMap.from(
          fields.map { case (k, fv) => resolveStr(k) -> walk(fv) }))
      case m: PoMap => PoMap(m.entries.map { case (k, mv) => (walk(k), walk(mv)) })
      case other => other
    }
    walk(v)
  }
}
