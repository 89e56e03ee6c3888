package graft
import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession so every entry point
  * (Verify, Bench, tests) runs with identical, race-free configuration.
  * Session-level conf is set at build time — never mutated mid-query
  * (VERDICT r1 #5).
  */
object GraftSession {
  /** Default parallelism = the full machine (the driver contract runs
    * local[32] on 32 cores; shuffle partitions match so every stage
    * fans exactly one task per core — not 200, whose tiny-partition
    * overhead dominates at bench scale). */
  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(GraftExtensions.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS), which the vectorized
      // reader rejects; read nanos as long and convert in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
