package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Quantize.int8 contracts: codes in range, roundtrip error bounded by
  * half a quantization step, zero vectors stay zero. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("int8 codes are in [-127,127]; roundtrip error <= maxabs/254 + eps") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = Quantize.int8(e)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("q8"))
      .as[(Long, Seq[Double], Seq[Int])].collect()
    assert(q.length == 500)
    q.foreach { case (id, emb, codes) =>
      assert(codes.length == emb.length)
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id out of range")
      val maxabs = emb.map(math.abs).max
      val step = maxabs / 127.0
      emb.zip(codes).foreach { case (x, c) =>
        val xhat = c * step
        assert(math.abs(x - xhat) <= step / 2 + 1e-12,
          s"vec $id: x=$x xhat=$xhat step=$step")
      }
    }
  }

  test("all-zero vector quantizes to all zeros (no NaN)") {
    import spark.implicits._
    val df = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.int8(df).select(col("vec_id"), col("q8"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(0, 0))
    assert(out(2L) == Seq(64, -127)) // 1/2·127 = 63.5 → floor(64.0) = 64
  }
}
