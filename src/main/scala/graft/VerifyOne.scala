package graft
import java.nio.file.{Files, Paths}

/** Single-query slice of [[Verify]] — same parquet dump + oracle_sql.json
  * contract, one query, so `tools/compare.py` can gate-check an operator
  * in seconds while iterating instead of re-running all queries.
  * Usage: runMain graft.VerifyOne <name> <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = GraftSession.build()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = SparkEntry.oracleSql.getOrElse(name,
      sys.error(s"no oracleSql entry for $name"))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${Verify.jsonString(name)}: ${Verify.jsonString(sql)}}")
    spark.stop()
  }
}
