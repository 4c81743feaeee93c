package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the classic Column <-> catalyst Expression
  * converters, which are `private[sql]` since the Spark Connect column
  * refactor. Everything else in the engine lives under `graft.*`. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column -> Expression conversion (UnresolvedFunction nodes
    * the analyzer then resolves) — what a FunctionRegistry builder must
    * return; [[expression]]'s lazy `ColumnNodeExpression` wrapper is
    * Unevaluable and never re-enters analysis from there. */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Scala-external -> catalyst-internal value converter for `dt`
    * (String -> UTF8String, Timestamp -> micros, ...): what an `InSet`
    * literal set must hold to match the column's runtime values. */
  def toCatalyst(dt: org.apache.spark.sql.types.DataType): Any => Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(dt)
}
