package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("salted aggregation equals direct aggregation on a skewed key") {
    import spark.implicits._
    // hot key: 90% of rows share key "hot"
    val df = (0 until 10000).map { i =>
      (if (i % 10 == 0) s"k${i % 50}" else "hot", i.toLong, i.toDouble / 7)
    }.toDF("k", "n", "v").repartition(8)

    val direct = df.groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("c"), min("n").as("mn"), max("n").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val salted = Skew.saltedAggregate(df, Seq("k"), salts = 16, Seq(
      Skew.Measure("v", "sum", "sv"), Skew.Measure("v", "count", "c"),
      Skew.Measure("n", "min", "mn"), Skew.Measure("n", "max", "mx")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (sv, c, mn, mx)) =>
      val (dsv, dc, dmn, dmx) = direct(k)
      assert(c == dc && mn == dmn && mx == dmx, s"key $k")
      assert(math.abs(sv - dsv) < 1e-6 * math.max(1.0, math.abs(dsv)),
        s"key $k: $sv vs $dsv") // double sums reorder under salting
    }

    // two aggregation exchanges in the plan: the salt spread is real
    val plan = Skew.saltedAggregate(df, Seq("k"), 16,
      Seq(Skew.Measure("v", "sum", "sv"))).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length >= 2, plan)
  }
}
