package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Multimodal plumbing: schema, batch shape, partitioning — real; the
  * decode itself is the documented STUB. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mediaDf = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, Array.fill[Byte](100 + i * 37)(i.toByte), "image/png")
    }.toDF("id", "media", "mime")
  }

  test("imageFeatures: schema contract + one decoder init per partition") {
    val df = mediaDf.repartition(4)
    Multimodal.StubDecoder.inits.set(0)
    val out = Multimodal.imageFeatures(df)
    assert(out.columns.toSeq == Seq("id", "width", "height", "channels", "features"))
    val rows = out.collect()
    assert(rows.length == 40)
    assert(Multimodal.StubDecoder.inits.get == 4,
      "decoder must init exactly once per partition (expensive-init contract)")
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 64)
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
    }
    // determinism: same bytes, same features
    val again = Multimodal.imageFeatures(df).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("frameSample: 1 video row explodes to N frame rows executor-side") {
    val out = Multimodal.frameSample(mediaDf, everyNth = 5)
    assert(out.columns.toSeq == Seq("id", "frame_idx", "frame"))
    val byId = out.collect().groupBy(_.getAs[Long]("id"))
    assert(byId.size == 40)
    byId.values.foreach { frames =>
      val idxs = frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq
      assert(idxs == idxs.indices.map(_ * 5L), "frame indices stride by everyNth")
    }
  }

  test("resizeImages: bytes transformed, target dims as metadata columns") {
    val out = Multimodal.resizeImages(mediaDf, 224, 224)
    assert(out.columns.toSeq == Seq("id", "media", "mime", "target_w", "target_h"))
    val r = out.filter(col("id") === 0).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("media")).startsWith("resized:224x224:"))
    assert(r.getAs[Int]("target_w") == 224)
  }

  test("balanceBySize: partition count tracks byte volume, not row count") {
    val total = mediaDf.select(sum(length(col("media")))).collect()(0).getLong(0)
    val target = total / 7
    val out = Multimodal.balanceBySize(mediaDf, target)
    assert(out.rdd.getNumPartitions == math.ceil(total.toDouble / target).toInt)
    val one = Multimodal.balanceBySize(mediaDf, total * 10)
    assert(one.rdd.getNumPartitions == 1)
  }
}
