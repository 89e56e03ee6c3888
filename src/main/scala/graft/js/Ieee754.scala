package graft.js

/** Transliterations of the public fdlibm/FreeBSD-msun algorithms for
  * the two Math functions where neither `java.lang.Math` nor
  * `StrictMath` reproduces V8 (measured in the round-10 differential
  * sweep: cbrt 118/1176 samples 1 ulp off, log2 369/1177): V8's
  * `Math.cbrt`/`Math.log2` are its base/ieee754 ports of FreeBSD's
  * `s_cbrt.c` / `e_log2.c` (Sun's fdlibm lineage, public sources),
  * while the JDK has no fdlibm log2 at all (log(x)/ln2 is a different
  * function) and its cbrt differs. These are algorithm
  * transliterations from the published sources, bit-validated against
  * node in JsConformanceSpec and the fuzz harness.
  */
object Ieee754 {
  private def hi(x: Double): Int =
    (java.lang.Double.doubleToRawLongBits(x) >>> 32).toInt
  private def lo(x: Double): Int =
    java.lang.Double.doubleToRawLongBits(x).toInt
  private def fromWords(h: Int, l: Int): Double =
    java.lang.Double.longBitsToDouble((h.toLong << 32) | (l.toLong & 0xffffffffL))
  private def setLow(x: Double, l: Int): Double = fromWords(hi(x), l)

  // ---- cbrt: FreeBSD s_cbrt.c ----
  private val B1 = 715094163 // B1 = (1023-1023/3-0.03306235651)*2**20
  private val B2 = 696219795 // B2 = (1023-1023/3-54/3-0.03306235651)*2**20
  private val P0 = 1.87595182427177009643
  private val P1 = -1.88497979543377169875
  private val P2 = 1.621429720105354466140
  private val P3 = -0.758397934778766047437
  private val P4 = 0.145996192886612446982

  def cbrt(x: Double): Double = {
    var ui = java.lang.Double.doubleToRawLongBits(x)
    var hx = ((ui >>> 32) & 0x7fffffffL).toInt
    if (hx >= 0x7ff00000) return x + x // cbrt(NaN, INF) is itself
    // rough cbrt to 5 bits via bit hack on the exponent
    if (hx < 0x00100000) { // subnormal
      ui = java.lang.Double.doubleToRawLongBits(x * 1.8014398509481984e16) // 2^54
      hx = ((ui >>> 32) & 0x7fffffffL).toInt
      if (hx == 0) return x // cbrt(+-0) is itself
      hx = hx / 3 + B2
    } else hx = hx / 3 + B1
    ui &= (1L << 63)
    ui |= hx.toLong << 32
    var t = java.lang.Double.longBitsToDouble(ui)
    // new cbrt to 23 bits
    var r = (t * t) * (t / x)
    t = t * ((P0 + r * (P1 + r * P2)) + ((r * r) * r) * (P3 + r * P4))
    // round t away from zero to 23 bits (halfway case rounds away)
    ui = java.lang.Double.doubleToRawLongBits(t)
    ui = (ui + 0x80000000L) & 0xffffffffc0000000L
    t = java.lang.Double.longBitsToDouble(ui)
    // one step Newton iteration to 53 bits with error < 0.667 ulps
    val s = t * t          // t*t is exact
    r = x / s              // error <= 0.5 ulps; |r| < |t|
    val w = t + t          // t+t is exact
    r = (r - t) / (w + r)  // r-t is exact; w+r ~= 3*t
    t = t + t * r          // error <= 0.5 + 0.5/3 + epsilon
    t
  }

  // ---- log2: FreeBSD e_log2.c + k_log.h (k_log1p kernel) ----
  private val Lg1 = 6.666666666666735130e-01
  private val Lg2 = 3.999999999940941908e-01
  private val Lg3 = 2.857142874366239149e-01
  private val Lg4 = 2.222219843214978396e-01
  private val Lg5 = 1.818357216161805012e-01
  private val Lg6 = 1.531383769920937332e-01
  private val Lg7 = 1.479819860511658591e-01

  private def kLog1p(f: Double): Double = {
    val s = f / (2.0 + f)
    val z = s * s
    val w = z * z
    val t1 = w * (Lg2 + w * (Lg4 + w * Lg6))
    val t2 = z * (Lg1 + w * (Lg3 + w * (Lg5 + w * Lg7)))
    val r = t2 + t1
    val hfsq = 0.5 * f * f
    s * (hfsq + r)
  }

  private val two54 = 1.80143985094819840000e+16
  private val ivln2hi = 1.44269504072144627571e+00
  private val ivln2lo = 1.67517131648865118353e-10

  def log2(x0: Double): Double = {
    var x = x0
    var hx = hi(x)
    val lx = lo(x)
    var k = 0
    if (hx < 0x00100000) { // x < 2**-1022
      if (((hx & 0x7fffffff) | lx) == 0)
        return Double.NegativeInfinity // log(+-0) = -inf
      if (hx < 0) return Double.NaN    // log(-#) = NaN
      k -= 54; x *= two54              // subnormal, scale up
      hx = hi(x)
    }
    if (hx >= 0x7ff00000) return x + x
    if (hx == 0x3ff00000 && lx == 0) return 0.0 // log(1) = +0
    k += (hx >> 20) - 1023
    hx &= 0x000fffff
    val i = (hx + 0x95f64) & 0x100000
    x = fromWords(hx | (i ^ 0x3ff00000), lo(x)) // normalize x or x/2
    k += i >> 20
    val y = k.toDouble
    val f = x - 1.0
    val hfsq = 0.5 * f * f
    val r = kLog1p(f)
    // f - hfsq must (for args near 1) be evaluated in extra precision
    var hi2 = f - hfsq
    hi2 = setLow(hi2, 0)
    val lo2 = (f - hi2) - hfsq + r
    var valHi = hi2 * ivln2hi
    var valLo = (lo2 + hi2) * ivln2lo + lo2 * ivln2hi
    // spadd(val_hi, val_lo, y): y is exact, val_hi rounds
    val w = y + valHi
    valLo += (y - w) + valHi
    valHi = w
    valLo + valHi
  }
}
