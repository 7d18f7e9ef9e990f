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

/** 60-bit SimHash — the corpus-size scaling knob the 32-bit form lacks:
  * with W bits split into B pigeonhole blocks, distance ≤ B−1 pairs must
  * share a block, and per-bucket occupancy is n / 2^(W/B). 60 bits over
  * 4 fifteen-bit blocks keeps the Hamming-≤3 guarantee at 2⁷× lower
  * occupancy than 4×8-bit blocking — candidate pairs per bucket drop
  * ~2¹⁴× at the same corpus size (README "Measured scaling", q62 vs
  * q78). Input tokens must carry 60 meaningful bits:
  * `poly_hash · 2³⁰ + poly_hash2`.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 needs an array<bigint> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.hashW(input.asInstanceOf[ArrayData], 60)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash32.hashW($c, 60)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash32 {
  /** Single pass over the token hashes; called from generated code. */
  def hash(toks: ArrayData): Long = hashW(toks, 32)

  /** Width-parametric majority vote; called from generated code. */
  def hashW(toks: ArrayData, width: Int): Long = {
    val votes = new Array[Int](width)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = toks.getLong(i)
      var j = 0
      while (j < width) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < width) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
