package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{ContentHashExpr, CosineSimExpr, DotProductExpr, NaturalKeyExpr, NfcNormalizeExpr}

/** Standard `SparkSessionExtensions` entry point: makes the engine's
  * native functions available on ANY cluster via configuration alone —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — so a session that never calls graft code directly (a SQL gateway, a
  * notebook, spark-submit) still gets `natural_key`, `content_hash`,
  * `dot_product`, `cosine_sim`. The imperative
  * `GraftFunctions.register(spark)` path stays for programmatic use;
  * both routes register the identical expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {
  private def fn(name: String, build: Seq[Expression] => Expression, clazz: Class[_]) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build)

  private[graft] val functions = Seq(
    fn("natural_key", es => NaturalKeyExpr(es.head), classOf[NaturalKeyExpr]),
    fn("content_hash", es => ContentHashExpr(es.head), classOf[ContentHashExpr]),
    fn("dot_product", es => DotProductExpr(es(0), es(1)), classOf[DotProductExpr]),
    fn("cosine_sim", es => CosineSimExpr(es(0), es(1)), classOf[CosineSimExpr]),
    fn("nfc_normalize", es => NfcNormalizeExpr(es.head), classOf[NfcNormalizeExpr]))

  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}
