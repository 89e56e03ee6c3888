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
      // SPARK_GRAFT_MASTER lets the CI-style multi-JVM check (VERDICT
      // r8 #2, tools/local_cluster_check.sh) run the same entry points
      // on local-cluster[n,c,mem] — separate executor JVMs, real
      // closure serialization — without touching the driver contract's
      // local[cpus] default.
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      // Honor the advisory post-shuffle partition size instead of
      // refusing to coalesce below default parallelism (Spark's own
      // production recommendation for this knob): small shuffles
      // collapse to few partitions — at bench scale that's the
      // difference between 32 ~200-row tasks (pure scheduling overhead)
      // and 1; at 100 TB post-shuffle partitions land on the 64 MB
      // advisory target either way. Map-side parallelism (scans, lens
      // map, decode) is untouched — coalescing applies to shuffle READS.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // managed tables (Layout.writeBucketed) land under target/, never
      // the repo root's default ./spark-warehouse
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      // events.ts is parquet TIMESTAMP(NANOS), which the vectorized
      // reader rejects; read nanos as long and convert in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
