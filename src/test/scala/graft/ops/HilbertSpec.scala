package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.expressions.GraftFunctions.hilbertIndex

/** Hilbert layout keys: the closed-form first-order curve, bijectivity,
  * the unit-step adjacency invariant (the locality property Z-order
  * lacks), domain enforcement, and whole-stage codegen. */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bits=1: the four quadrants walk the canonical U") {
    // (0,0) -> (0,1) -> (1,1) -> (1,0)
    assert(hilbertIndex(0, 0, 1) == 0L)
    assert(hilbertIndex(0, 1, 1) == 1L)
    assert(hilbertIndex(1, 1, 1) == 2L)
    assert(hilbertIndex(1, 0, 1) == 3L)
  }

  test("bits=2: known 4x4 curve start and end") {
    assert(hilbertIndex(0, 0, 2) == 0L)
    assert(hilbertIndex(1, 0, 2) == 1L)  // first sub-square is reflected
    assert(hilbertIndex(1, 1, 2) == 2L)
    assert(hilbertIndex(0, 1, 2) == 3L)
    assert(hilbertIndex(0, 2, 2) == 4L)
    assert(hilbertIndex(3, 0, 2) == 15L) // curve ends at (n-1, 0)
  }

  test("bijective on the full 16x16 grid; every step is unit manhattan") {
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield hilbertIndex(x, y, 4) -> (x, y)
    val byD = cells.toMap
    assert(byD.size == 256, "indices must be distinct (bijection)")
    assert(byD.keys.min == 0L && byD.keys.max == 255L)
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} must be adjacent: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("z-order takes non-unit jumps where hilbert never does") {
    // the classic z diagonal: morton 1 = (1,0), morton 2 = (0,1)
    val jumps = (0 until 255).map { d =>
      // invert 4-bit morton
      def unpack(v: Int) = (0 until 4).map(j => ((v >> (2 * j)) & 1) << j).sum
      val (x1, y1) = (unpack(d), unpack(d >> 1))
      val (x2, y2) = (unpack(d + 1), unpack((d + 1) >> 1))
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(jumps.exists(_ > 1), "z-order must exhibit a jump >1 somewhere")
  }

  test("out-of-domain inputs throw rather than wrap") {
    intercept[IllegalArgumentException](hilbertIndex(256, 0, 8))
    intercept[IllegalArgumentException](hilbertIndex(-1, 0, 8))
    intercept[IllegalArgumentException](hilbertIndex(0, 0, 0))
  }

  test("column form matches the static helper and stays in codegen") {
    val df = spark.range(0, 64)
      .select((col("id") / 8).cast("long").as("x"), (col("id") % 8).as("y"))
    val q = df.withColumn("h", Layout.hilbertKey(col("x"), col("y"), 3))
    val got = q.as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) => assert(h == hilbertIndex(x, y, 3)) }
    // '*(n)' marks a WholeStageCodegen span in the compact plan string;
    // the projection carrying hilbert_index must sit inside one
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("hilbert_index")), plan)
  }

  test("bucket ranges have tighter bounding boxes than z-order on average") {
    // the layout claim itself, measured: mean bbox area of 64-key
    // buckets over the full 256-cell grid, hilbert vs morton
    def bboxArea(cells: Seq[(Int, Int)]): Long = {
      val xs = cells.map(_._1); val ys = cells.map(_._2)
      (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1).toLong
    }
    val all = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val hil = all.groupBy { case (x, y) => hilbertIndex(x, y, 4) / 64 }
    def morton(x: Int, y: Int) =
      (0 until 4).map(j => (((x >> j) & 1) << (2 * j)) | (((y >> j) & 1) << (2 * j + 1))).sum
    val mor = all.groupBy { case (x, y) => morton(x, y) / 64 }
    val hilMean = hil.values.map(c => bboxArea(c.toSeq)).sum.toDouble / hil.size
    val morMean = mor.values.map(c => bboxArea(c.toSeq)).sum.toDouble / mor.size
    assert(hilMean <= morMean,
      s"hilbert bbox mean $hilMean must not exceed z-order's $morMean")
  }
}
