package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for training batches: assign documents
  * to contiguous bins of ≈`budget` tokens within each shard.
  *
  * The rule is the deterministic one-pass greedy: bins are contiguous
  * runs in `orderCol` order, a doc opens a new bin when the running
  * total crosses a budget boundary — `bin = (cum - own) div budget`. An
  * oversized doc simply spans boundaries and still lands in exactly one
  * bin (pipelines want determinism and one pass, not NP-optimal bin
  * packing).
  *
  * Scale shape: ONE window per shard (`shardCol` partitions it), so
  * packing parallelizes across shards — which is also what training
  * wants (shard-local batches). A single global packing order would be
  * a one-reducer window; shard first. Integer arithmetic throughout:
  * the assignment is exactly reproducible on any engine. */
object Packing {

  /** Adds `__tok` (the token count used) and `bin` columns. Rejects
    * inputs that already carry those names (withColumn would silently
    * clobber a caller's column otherwise). */
  def packByBudget(docs: DataFrame, budget: Long, shardCol: String,
                   orderCol: String, tokensCol: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    val reserved = Seq("__tok", "__cum", "bin").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"packByBudget writes columns ${reserved.mkString(", ")} — rename them in the input first")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    docs.withColumn("__tok", tokensCol.cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .withColumn("bin", expr(s"(__cum - __tok) div ${budget}L"))
      .drop("__cum")
  }
}
