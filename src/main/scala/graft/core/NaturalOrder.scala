package graft.core

/** Natural (digit-run aware) string ordering — record IDs in collection
  * meta are kept in natural order (reference: base-data-model.js:46, via
  * the `string-natural-compare` package): "r2" < "r10", digit runs
  * compare numerically, everything else per code point.
  */
object NaturalOrder extends Ordering[String] {

  def compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.charAt(i)
      val cb = b.charAt(j)
      if (ca.isDigit && cb.isDigit) {
        // consume full digit runs, compare numerically
        var i2 = i; while (i2 < a.length && a.charAt(i2).isDigit) i2 += 1
        var j2 = j; while (j2 < b.length && b.charAt(j2).isDigit) j2 += 1
        // strip leading zeros
        var is = i; while (is < i2 - 1 && a.charAt(is) == '0') is += 1
        var js = j; while (js < j2 - 1 && b.charAt(js) == '0') js += 1
        val la = i2 - is
        val lb = j2 - js
        if (la != lb) return la - lb
        var k = 0
        while (k < la) {
          val c = a.charAt(is + k) - b.charAt(js + k)
          if (c != 0) return c
          k += 1
        }
        // equal numeric value (possibly different leading zeros): keep
        // comparing the rest of the string — the zeros only matter as the
        // final tiebreak below ("a01z" > "a1b" because z > b)
        i = i2; j = j2
      } else {
        if (ca != cb) return ca - cb
        i += 1; j += 1
      }
    }
    if (i < a.length || j < b.length) (a.length - i) - (b.length - j)
    // equal modulo leading zeros: deterministic lexicographic tiebreak on
    // the originals ("01" < "1"), mirroring naturalKey's NUL+original tail
    else a.compareTo(b)
  }

  /** A plain-string sort key k such that lexicographic order of k equals
    * [[compare]] order — lets Spark `orderBy(naturalKey($"id"))` sort
    * naturally with a codegen'd binary comparison instead of a custom
    * comparator (distributed range partitioning needs a sortable key).
    *
    * Digit runs are rewritten to: '0' marker + 5-digit length of the
    * zero-stripped run + the stripped digits. A trailing tiebreak of the
    * original string keeps "01" vs "1" deterministic.
    */
  def naturalKey(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isDigit) {
        var i2 = i; while (i2 < s.length && s.charAt(i2).isDigit) i2 += 1
        var is = i; while (is < i2 - 1 && s.charAt(is) == '0') is += 1
        val run = s.substring(is, i2)
        sb.append('0').append(f"${run.length}%05d").append(run)
        i = i2
      } else {
        sb.append(c)
        i += 1
      }
    }
    // tiebreak on the original string; the NUL separator sorts below every
    // real char, so a prefix keys before its extensions (matches compare())
    sb.append('\u0000').append(s)
    sb.toString
  }
}
