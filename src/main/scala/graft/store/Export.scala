package graft.store

import java.io.OutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.codec.{CborCodec, JsonCodec, XmlCodec, YamlCodec}
import graft.core._
import graft.markup.Markup

/** Flat-file / zip / raw export surface (reference:
  * library/controllers/export-controller.js). The engine side produces
  * iterators of framed chunks; an HTTP layer (out of engine scope) would
  * stream them straight out.
  *
  * Entry shape (export-controller.js:25-41 pathQuery): records stream as
  * `{id, version, hash, data}` objects; with `?at=`, records whose
  * version predates `at` emit a stub without `data` — the pull-sync
  * protocol (docs/api/export.md:16-18).
  */
object Export {

  /** Ordered entry stream for one collection path, with `?at=` stubs
    * (version >= at gets data) and the documented `?after=` strict
    * variant (version > after — docs/api/export.md:16-18; the reference
    * documents it but only implements `at`). Ordered by natural record
    * id (the reference's archive order); `toLocalIterator` keeps only
    * one partition in driver memory. */
  def entries(store: Store, path: DataPath, at: Option[Long] = None,
              after: Option[Long] = None): Iterator[PoValue] = {
    val spark = store.spark
    graft.expressions.GraftFunctions.register(spark)
    val df = ReadPath.read(store, path).orderBy(expr("natural_key(id)"))
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala.map { r =>
      val id = r.getAs[String]("id")
      val version = r.getAs[Long]("version")
      val hash = r.getAs[String]("hash")
      val base = Vector[(String, PoValue)](
        "id" -> PoStr(id), "version" -> PoInt(version), "hash" -> PoStr(hash))
      val fields =
        if (at.forall(version >= _) && after.forall(version > _))
          base :+ ("data" -> Cbor.decode(r.getAs[Array[Byte]]("value")))
        else base
      PoObj(scala.collection.immutable.VectorMap.from(fields))
    }
  }

  /** Flat-file export framing per format (reference: json.js encodeIterable
    * array mode :100-128, json-lines.js:31-35, cbor concatenation,
    * yaml.js:67-75 multi-doc `...`, xml/entries-encoder.js:7-32
    * `<export xmlns="pigeon-optics:export">` envelope). */
  def flatFile(store: Store, path: DataPath, format: String,
               at: Option[Long] = None,
               after: Option[Long] = None): Iterator[Array[Byte]] = {
    val es = entries(store, path, at, after)
    format match {
      case "json" =>
        // [\n  entry,\n  entry\n]\n
        val body = es.zipWithIndex.map { case (e, i) =>
          (if (i == 0) "[\n  " else ",\n  ") + JsonCodec.encodeString(e)
        }
        new Iterator[Array[Byte]] {
          private var done = false
          private var emitted = false
          def hasNext: Boolean = body.hasNext || !done
          def next(): Array[Byte] =
            if (body.hasNext) { emitted = true; body.next().getBytes(UTF_8) }
            else { done = true; (if (emitted) "\n]\n" else "[\n]\n").getBytes(UTF_8) }
        }
      case "jsonl" =>
        es.map(e => (JsonCodec.encodeString(e) + "\n").getBytes(UTF_8))
      case "cbor" =>
        es.map(Cbor.encode)
      case "yaml" =>
        es.map(e => (YamlCodec.encodeString(e) + "...\n").getBytes(UTF_8))
      case "xml" =>
        // envelope + one <record hash version id> element per entry
        val head = Iterator("<export xmlns=\"pigeon-optics:export\">\n")
        val body = es.map { e =>
          val o = e.asInstanceOf[PoObj].fields
          val data = o.get("data")
          val attrs = PoObj(
            "hash" -> o("hash"), "version" -> PoStr(o("version") match {
              case PoInt(v) => v.toString
              case other => other.toString
            }), "id" -> o("id"))
          val dataNode = data.map { d =>
            if (Markup.getType(d).exists(t => t == "tag" || t == "fragment")) d
            else XmlCodec.arbitraryNode(d)
          }
          val rec = PoArr(Vector(PoStr("record"), attrs) ++ dataNode.toVector)
          Markup.toXML(rec) + "\n"
        }
        val tail = Iterator("</export>\n")
        (head ++ body ++ tail).map(_.getBytes(UTF_8))
      case other =>
        throw new IllegalArgumentException(s"no flat-file framing for .$other")
    }
  }

  /** Zip archive export (reference streamArchive :43-91):
    * `/records/<id>.<ext>` entries plus deduplicated
    * `/attachments/<hex>` blobs.
    *
    * Scale note: zip is an inherently sequential container, so this
    * streams every record through the single response thread — right
    * for an HTTP download (memory-bounded via the entries iterator),
    * wrong for bulk archival at 100 TB; that path is a distributed
    * write of the flat-file framings (one part per partition), not a
    * zip. */
  def zip(store: Store, path: DataPath, format: String, out: OutputStream,
          includeAttachments: Boolean = false): Unit = {
    val codec = graft.codec.Codec.byExtension(format)
      .getOrElse(throw new IllegalArgumentException(s"no codec for .$format"))
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("records/")); z.closeEntry()
    if (includeAttachments) { z.putNextEntry(new ZipEntry("attachments/")); z.closeEntry() }
    val written = scala.collection.mutable.Set[String]()
    entries(store, path).foreach { e =>
      val o = e.asInstanceOf[PoObj].fields
      val id = o("id").asInstanceOf[PoStr].s
      val data = o("data")
      z.putNextEntry(new ZipEntry(s"records/${zipSafe(id)}.$format"))
      z.write(codec.encode(data))
      z.closeEntry()
      if (includeAttachments) {
        RecordStructure.listHashURLs(data).foreach { link =>
          RecordStructure.hashOf(link).foreach { hex =>
            if (!written.contains(hex)) {
              written += hex
              store.attachments.read(hex).foreach { bytes =>
                z.putNextEntry(new ZipEntry(s"attachments/$hex"))
                z.write(bytes)
                z.closeEntry()
              }
            }
          }
        }
      }
    }
    z.finish()
  }

  /** Zip-slip guard: record ids written by lenses bypass DataPath
    * validation, so an id like `../../etc/cron` must not become a
    * traversing archive entry. Percent-encodes only the dangerous
    * bytes — typical ids are unchanged. */
  private def zipSafe(id: String): String = {
    val enc = id.replace("%", "%25").replace("/", "%2F").replace("\\", "%5C")
    if (enc == "." || enc == "..") "%2E" * enc.length else enc
  }

  /** Raw record serving (S11, export-controller.js:178-197): a record
    * whose root is a string or bytes serves as-is; anything else goes
    * through the named codec. Returns (bytes, suggested extension). */
  def raw(store: Store, path: DataPath, format: String = "json"): (Array[Byte], String) = {
    val v = ReadPath.readRecord(store, path)
      .getOrElse(throw new NoSuchElementException(s"no record at ${path.encoded}"))
    v match {
      case PoStr(s) => (s.getBytes(UTF_8), "txt")
      case b: PoBytes => (b.bytes, "bin")
      case other =>
        val codec = graft.codec.Codec.byExtension(format)
          .getOrElse(throw new IllegalArgumentException(s"no codec for .$format"))
        (codec.encode(other), format)
    }
  }
}
