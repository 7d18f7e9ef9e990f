package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two float-embedding arrays — the
  * kernel of the similarity-search path (brute-force cosine baseline and
  * the IVF/LSH-bucketed scale variants over `embeddings.embedding`).
  *
  * Accumulates strictly left-to-right in double precision, so results are
  * bitwise identical to the algebraic form
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` and to DuckDB's
  * `list_reduce(list_transform(...), (acc, x) -> acc + x)` — but without
  * the per-row array allocation and interpreted lambda evaluation of
  * higher-order functions, and inside whole-stage codegen. On a 100 TB
  * corpus the candidate-pair stream hits this once per pair; interpreted
  * HOFs are the difference between a compute-bound and a GC-bound scan.
  *
  * Mismatched lengths yield null (the HOF form also nulls via zip_with
  * padding); null or null-element inputs yield null.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"float_dot needs two array<float> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dot = nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Double $r = graft.expressions.FloatDot.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
    dot
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_dot"
}

object FloatDot {
  /** Sequential-order dot; called from generated code. Boxed return so
    * length mismatch / null elements propagate as SQL null. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}
