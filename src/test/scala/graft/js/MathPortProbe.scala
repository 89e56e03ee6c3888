package graft.js

/** Offline validator for the Ieee754 ports: reads the node-generated
  * sample file (fn, x, v8result) JSON produced by the round-10 sweep
  * (see tools/jsfuzz/README.md) and reports bit-mismatch counts for
  * cbrt/log2 against V8, alongside the JDK baselines. Not a unit test
  * (needs the node-side file); run via
  * `Test/runMain graft.js.MathPortProbe [/tmp/v8math.json]`. */
object MathPortProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/v8math.json")
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    // rows: ["fn", x, v] or ["fn", x, y, v]; numbers may be `null` (NaN)
    val row = """\["(\w+)",([^,\]]+),([^,\]]+)(?:,([^,\]]+))?\]""".r
    def num(s: String): Double =
      if (s == null || s == "null") Double.NaN else s.toDouble
    var stats = Map.empty[String, (Int, Int, Int)] // n, jdkDiff, portDiff
    for (m <- row.findAllMatchIn(txt)) {
      val fn = m.group(1)
      if (fn == "cbrt" || fn == "log2") {
        val x = num(m.group(2))
        val v = num(if (m.group(4) != null) m.group(4) else m.group(3))
        val jdk = fn match {
          case "cbrt" => StrictMath.cbrt(x)
          case "log2" => StrictMath.log(x) / StrictMath.log(2.0)
        }
        val port = fn match {
          case "cbrt" => Ieee754.cbrt(x)
          case "log2" => Ieee754.log2(x)
        }
        def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
        if (bits(port) != bits(v))
          println(s"PORTDIFF $fn x=${java.lang.Double.toHexString(x)} ($x) v8=$v port=$port")
        val (n, a, b) = stats.getOrElse(fn, (0, 0, 0))
        stats += fn -> (n + 1,
          a + (if (bits(jdk) != bits(v)) 1 else 0),
          b + (if (bits(port) != bits(v)) 1 else 0))
      }
    }
    stats.toSeq.sortBy(_._1).foreach { case (fn, (n, jdk, port)) =>
      println(f"$fn%-6s n=$n%5d  jdk!=v8: $jdk%5d  port!=v8: $port%5d")
    }
  }
}
