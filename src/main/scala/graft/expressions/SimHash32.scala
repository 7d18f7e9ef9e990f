package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 32-bit SimHash of a hashed-token array: bit j of the result is set
  * iff more tokens have bit j set than clear (strict majority of ±1
  * votes) — the exact semantics of the exploded bit-vote aggregation
  * exposed as q33 (`SUM(±1) > 0` per bit), collapsed into one pass per
  * row. The exploded form shuffles |tokens|×32 rows through two
  * aggregations; this kernel is pure map-side work inside whole-stage
  * codegen, which is what lets near-dup banding run signature
  * construction at scan speed on a 100 TB corpus.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 needs an array<bigint> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  /** Single pass over the token hashes; called from generated code. */
  def hash(toks: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = toks.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
