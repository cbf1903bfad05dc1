package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the conversion utilities
  * `private[sql]` (Column is backed by ColumnNodes in the unified API);
  * custom Catalyst expressions still need them, so this object lives under
  * the org.apache.spark.sql package to reach ExpressionUtils — the standard
  * extension-point pattern for libraries shipping native expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
