package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/bandwidth reduction ahead of ANN
  * serving: symmetric per-vector int8 — scale = 127 / max|x|, q_i =
  * floor(x_i · scale + 0.5). floor(+0.5) is used instead of round()
  * deliberately: round()'s half-case semantics differ between engines
  * (HALF_UP vs banker's depending on type and engine), floor is exact
  * IEEE everywhere, so the quantized bytes are bit-reproducible from
  * SQL (q34's oracle).
  *
  * No clamp is needed: x·scale ∈ [-127, 127] by construction, so
  * floor(±127 + 0.5) stays within int8 range. All-zero vectors (scale
  * would be ∞ → NaN) quantize to all zeros explicitly.
  *
  * Scale note: maxabs is PROJECTED before the quantizing transform —
  * referencing the array_max subtree inside the lambda body would
  * re-evaluate it once per element (the q25/q32 repeated-subtree trap).
  */
object Quantize {

  /** Adds `q8 ARRAY<INT>` (the int8 codes; INT-typed for portability)
    * next to the original embedding column. */
  def int8(df: DataFrame, embCol: String = "embedding",
           outCol: String = "q8"): DataFrame = {
    val e = col(embCol).cast("array<double>")
    df.withColumn("__maxabs", array_max(transform(e, x => abs(x))))
      .withColumn(outCol,
        when(col("__maxabs") === 0.0, transform(e, _ => lit(0)))
          .otherwise(transform(e,
            x => floor(x * (lit(127.0) / col("__maxabs")) + lit(0.5)).cast("int"))))
      .drop("__maxabs")
  }

  /** Dequantize: x̂_i = q_i · max|x| / 127 (needs the original maxabs). */
  def dequantizeExpr(q8: Column, maxabs: Column): Column =
    transform(q8, q => q.cast("double") * maxabs / lit(127.0))
}
