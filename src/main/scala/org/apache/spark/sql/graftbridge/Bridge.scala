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

  /** Non-blocking read of an Observation's metrics (`getOrEmpty` is
    * `private[sql]` in Spark 4; `get` blocks with no timeout, which a
    * caller that wants a bounded wait + fallback cannot use). */
  def observationGetOrEmpty(
      o: org.apache.spark.sql.Observation): Map[String, Any] = o.getOrEmpty
}
