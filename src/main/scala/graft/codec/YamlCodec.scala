package graft.codec

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.{YAMLFactory, YAMLMapper}

import graft.core.PoValue

/** YAML codec (reference: library/models/codec/yaml.js). Carries the
  * same logical model as the JSON codec by reusing its `{type, data}`
  * wrapper forms through a YAML surface — the reference uses js-yaml
  * custom schema types for the same purpose (yaml.js:7-32); wire-level
  * compatibility with js-yaml tags is not required (codecs are a
  * serialization boundary, not an exchange format with the reference).
  * Multi-document `...` framed entry streams are provided by the export
  * layer (reference yaml.js:67-75).
  */
object YamlCodec extends Codec {
  val handles: Seq[String] = Seq("application/yaml", "text/yaml")
  val extensions: Seq[String] = Seq("yaml", "yml")

  private val json = new ObjectMapper()
  private val yaml = {
    // SnakeYAML defaults to a 3 MB parse limit; records run to 20 MB
    // (reference maxRecordSize) and YAML inflates binary/escaped content,
    // so allow 256 MB documents.
    val opts = new org.yaml.snakeyaml.LoaderOptions()
    opts.setCodePointLimit(256 * 1024 * 1024)
    new YAMLMapper(YAMLFactory.builder().loaderOptions(opts).build())
  }

  def encode(v: PoValue): Array[Byte] = encodeString(v).getBytes(UTF_8)
  def decode(bytes: Array[Byte]): PoValue = decodeString(new String(bytes, UTF_8))

  def encodeString(v: PoValue): String =
    yaml.writeValueAsString(json.readTree(JsonCodec.encodeString(v)))

  def decodeString(s: String): PoValue = JsonCodec.revive(yaml.readTree(s))
}
