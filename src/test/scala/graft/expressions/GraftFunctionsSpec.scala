package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core._

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("natural_key expression == NaturalOrder.naturalKey, codegen'd (no ScalaUDF)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val ids = Seq("r10", "r2", "a01z", "a1b", "x", "01", "1")
    val df = ids.toDF("id").select(col("id"), expr("natural_key(id)").as("k"))
    df.collect().foreach { r =>
      assert(r.getString(1) == NaturalOrder.naturalKey(r.getString(0)))
    }
    // sorting by the expression equals NaturalOrder
    val sorted = ids.toDF("id").orderBy(expr("natural_key(id)"))
      .as[String].collect().toSeq
    assert(sorted == ids.sorted(NaturalOrder))
    // the analyzed plan contains the native expression, not a ScalaUDF
    // boundary (the optimizer even constant-folds it over local
    // relations — impossible across a UDF's opaque boundary)
    val plan = df.queryExecution.analyzed.toString
    assert(plan.contains("natural_key"))
    assert(!plan.contains("UDF"), s"expected no UDF boundary in:\n$plan")
  }

  test("content_hash over stored value bytes == commit-path hash") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vals = Seq(
      PoObj("a" -> PoInt(1)),
      PoSet(PoStr("x"), PoStr("y")),
      PoStr("hello"))
    val df = vals.map(v => Cbor.encode(v)).toDF("value")
      .select(expr("content_hash(value)").as("h"))
    val got = df.as[String].collect().toSeq
    assert(got == vals.map(Cbor.hash))
    // integrity check pattern: hashes are stable under set reordering
    val reordered = Cbor.encode(PoSet(PoStr("y"), PoStr("x")))
    val h2 = Seq(reordered).toDF("value")
      .select(expr("content_hash(value)")).as[String].collect().head
    assert(h2 == Cbor.hash(vals(1)))
  }

  test("SQL surface: functions usable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT natural_key('doc10') AS k").collect()(0).getString(0)
    assert(r == NaturalOrder.naturalKey("doc10"))
  }

  test("GraftExtensions injects all functions into a fresh session state") {
    // newSession() builds a FRESH function registry from the session's
    // extensions — no GraftFunctions.register call anywhere on this
    // path, so success proves configuration-only injection
    // (spark.sql.extensions=graft.GraftExtensions) works on a cluster.
    val fresh = spark.newSession()
    val r = fresh.sql(
      """SELECT natural_key('doc10') AS k,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c
        |""".stripMargin).collect().head
    assert(r.getString(0) == NaturalOrder.naturalKey("doc10"))
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("dot_product / cosine_sim: values, null element, length mismatch, SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    import graft.ops.Ann
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val (d, c) = df.select(
        Ann.dot(col("a"), col("b")),
        Ann.cosine(col("a"), col("b")))
      .as[(Double, Double)].collect().head
    assert(d == 32.0)
    val expectC = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(c == expectC) // bit-exact: same op order
    // HOF-spelling parity on the null/mismatch edges
    val edges = spark.sql(
      """SELECT
        |  dot_product(array(1.0d, 2.0d), array(1.0d)) AS len_mismatch,
        |  dot_product(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS null_elem,
        |  cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS zero_norm
        |""".stripMargin).collect().head
    assert(edges.isNullAt(0))
    assert(edges.isNullAt(1))
    assert(edges.getDouble(2).isNaN) // 0/0 — same as the HOF spelling
  }
}
