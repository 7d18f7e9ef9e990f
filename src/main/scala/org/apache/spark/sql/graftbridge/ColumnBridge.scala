package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * supported way for an external library to lift a custom Catalyst
  * `Expression` into the public Column API on Spark 4. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → Catalyst conversion: unlike `expression`, which
    * wraps the node lazily (Unevaluable until a classic Dataset converts
    * it), this produces a real expression tree immediately — required
    * when the expression is returned from a FunctionRegistry builder,
    * where no Dataset-side conversion ever runs. Nested functions come
    * out as UnresolvedFunction and resolve in later analyzer passes. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
