package graft.codec

import graft.core.PoValue

/** A document codec: bytes/string <-> [[PoValue]] (reference:
  * library/models/codec/index.js:4-16 — each format exposes
  * encode/decode plus streaming variants; our streaming variants are the
  * iterable entry forms used by import/export). */
trait Codec {
  /** mime types this codec serves (reference `handles`) */
  def handles: Seq[String]
  /** file extensions (reference `extensions`) */
  def extensions: Seq[String]
  def encode(v: PoValue): Array[Byte]
  def decode(bytes: Array[Byte]): PoValue
}

object Codec {
  /** codec registry by extension (reference: codec/index.js:38-49
    * `for`/`mediaTypeHandlers`). Populated as formats land. */
  def byExtension(ext: String): Option[Codec] = ext.toLowerCase match {
    case "json" => Some(JsonCodec)
    case "jsonl" => Some(JsonLinesCodec)
    case "cbor" => Some(CborCodec)
    case "yaml" | "yml" => Some(YamlCodec)
    case "xml" => Some(XmlCodec)
    case "msgpack" => Some(MsgPackCodec)
    case "html" | "htm" => Some(HtmlCodec)
    case _ => None
  }
}

/** CBOR as a [[Codec]] — delegates to the canonical core codec. */
object CborCodec extends Codec {
  val handles: Seq[String] = Seq("application/cbor")
  val extensions: Seq[String] = Seq("cbor")
  def encode(v: PoValue): Array[Byte] = graft.core.Cbor.encode(v)
  def decode(bytes: Array[Byte]): PoValue = graft.core.Cbor.decode(bytes)
}
