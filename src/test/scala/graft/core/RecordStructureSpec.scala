package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** F6 hash-URL discovery — mirrors test/test-utility-record-structure.js. */
class RecordStructureSpec extends AnyFunSuite {
  import PoValue.of

  val hex = "a" * 64
  val url = s"hash://sha256/$hex?type=image-png"

  test("finds urls as array elements, object values, object keys, set members, map entries") {
    assert(RecordStructure.listHashURLs(PoArr(Vector(PoStr(url), of(1)))) == Vector(url))
    assert(RecordStructure.listHashURLs(PoObj("k" -> PoStr(url))) == Vector(url))
    assert(RecordStructure.listHashURLs(PoObj(url -> of(1))) == Vector(url))
    assert(RecordStructure.listHashURLs(PoSet(PoStr(url))) == Vector(url))
    assert(RecordStructure.listHashURLs(PoMap.of(PoStr(url) -> of(1))) == Vector(url))
    assert(RecordStructure.listHashURLs(PoMap.of(of(1) -> PoStr(url))) == Vector(url))
  }

  test("line-anchored matches only — reference regex is ^...$ with /im") {
    assert(RecordStructure.listHashURLs(PoStr(s"see $url for details")).isEmpty)
    assert(RecordStructure.listHashURLs(PoStr("hash://sha256/short")).isEmpty)
    // query string is REQUIRED by the reference pattern
    assert(RecordStructure.listHashURLs(PoStr(s"hash://sha256/$hex")).isEmpty)
    // the /m flag matches a URL on its own line inside longer text
    assert(RecordStructure.listHashURLs(PoStr(s"preamble\n$url\npostscript")) == Vector(url))
  }

  test("case-insensitive match, hex normalized to lowercase (the /i flag + toLowerCase)") {
    val upper = s"HASH://SHA256/${hex.toUpperCase}?TYPE=X"
    assert(RecordStructure.listHashURLs(PoStr(upper)) == Vector(s"hash://sha256/$hex?TYPE=X"))
  }

  test("dedups and preserves first-encounter order") {
    val hex2 = "b" * 64
    val url2 = s"hash://sha256/$hex2?type=video-mp4"
    val v = PoArr(Vector(PoStr(url), PoStr(url2), PoStr(url)))
    assert(RecordStructure.listHashURLs(v) == Vector(url, url2))
    assert(RecordStructure.hashOf(url).contains(hex))
  }
}
