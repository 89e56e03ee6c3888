package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-package-private Column <-> Expression converters
  * (Spark 4 removed the public `new Column(expr)` constructor). Lives in
  * `org.apache.spark.sql` solely to satisfy `private[sql]` access — the
  * standard extension-library pattern; no Spark internals are modified. */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
