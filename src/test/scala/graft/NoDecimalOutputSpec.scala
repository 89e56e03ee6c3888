package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r12 #6 — the q117 class of bug, enforced at build time: no
  * `SparkEntry.queries` output schema may contain a DECIMAL anywhere
  * (top-level or nested). The driver's compare reads Spark results
  * through pandas, which collapses DECIMAL(38,0) to float64 on both
  * sides and can hash-FAIL (or worse, silently pass) on values a
  * DOUBLE cannot hold exactly — so the engine's output contract is
  * LONG/DOUBLE/STRING only (SparkEntry's scaladoc; tools/compare.py:
  * 51-57 hard-fails the same rule driver-side). Internal decimal math
  * is fine; it must be projected to a supported type before the
  * result surfaces (the q117 fix: internal decimal sort key, DOUBLE
  * projection after the sort).
  *
  * Iterates every query at sf0.001 — fixture-building queries execute
  * their commits/builds here, which is the point: the schema checked
  * is the schema the driver hashes. */
class NoDecimalOutputSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
    case a: ArrayType => hasDecimal(a.elementType)
    case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case _ => false
  }

  test("no query output schema contains a DECIMAL column") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val spark = SparkTestBase.spark
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema =
        try q(spark, sfDir).schema
        catch { case e: Throwable =>
          fail(s"$name failed to build its DataFrame at sf0.001: $e")
        }
      schema.fields.collect {
        case f if hasDecimal(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty,
      s"DECIMAL output columns (forbidden by the driver-compare contract): ${bad.mkString("; ")}")
  }
}
