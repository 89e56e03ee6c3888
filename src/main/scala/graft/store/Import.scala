package graft.store

import graft.codec.Codec
import graft.core._

/** File import — S7/S8 (reference:
  * library/controllers/dataset-controller.js:249-298). Two modes:
  *  - `files`: one record per uploaded file, recordID = filename minus
  *    extension, value decoded by the extension's codec;
  *  - `entriesFile`: one file containing many entries — a map
  *    `{recordID: value}` or an array of `[recordID, value]` pairs
  *    (the shapes the reference's streaming import decodes).
  * Both commit through writeEntries, so validation/versioning applies.
  */
object Import {

  private def split(filename: String): (String, String) = {
    val i = filename.lastIndexOf('.')
    if (i <= 0) (filename, "") else (filename.substring(0, i), filename.substring(i + 1))
  }

  def files(coll: Collection, uploads: Seq[(String, Array[Byte])],
            mode: WriteMode = WriteMode.Merge): Long = {
    val entries = uploads.map { case (filename, bytes) =>
      // basename only: zip entries can carry directory prefixes, and a
      // path-ish record id would be unaddressable by the record routes
      // (and a traversal hazard in file-shaped surfaces). The id must
      // pass the same hygiene DataPath enforces for addressed records.
      val flat = filename.substring(filename.lastIndexOf('/') + 1)
      val (base, ext) = split(flat)
      val codec = Codec.byExtension(ext).getOrElse(
        throw new IllegalArgumentException(s"no codec for .$ext ($filename)"))
      DataPath.checkRecordID(base)
      WriteEntry(base, Some(codec.decode(bytes)))
    }
    coll.writeEntries(entries, mode)
  }

  def entriesFile(coll: Collection, filename: String, bytes: Array[Byte],
                  mode: WriteMode = WriteMode.Merge): Long = {
    val (_, ext) = split(filename)
    val codec = Codec.byExtension(ext).getOrElse(
      throw new IllegalArgumentException(s"no codec for .$ext ($filename)"))
    val entries = codec.decode(bytes) match {
      case PoObj(fields) =>
        fields.toSeq.map { case (id, v) => WriteEntry(id, Some(v)) }
      case PoArr(items) =>
        items.map {
          case PoArr(Vector(PoStr(id), v)) => WriteEntry(id, Some(v))
          case other => throw new IllegalArgumentException(
            s"entries array elements must be [id, value] pairs, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"entries file must decode to an object or pair array, got ${other.typeName}")
    }
    coll.writeEntries(entries, mode)
  }
}
