package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.build()
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val times = (1 to 3).map(_ => run())
    println(f"BENCHONE $name min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
