package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary kernel: one O(L) pass emitting
  * every position `i` (1-based, `w ≤ i ≤ len`) where the poly-hash of
  * the trailing `w`-code-point window is ≡ 0 mod `d` — the rolling-hash
  * boundary rule of CDC dedup (rsync/LBFS lineage; q108).
  *
  * Value-identical to the Column-algebra form
  * `filter(sequence(w, length(text)), i => poly_hash(substr(i-w+1, w)) % d)`
  * — the rolling update `h' = ((h − c_out·31^{w−1})·31 + c_in) mod p`
  * removes the leading code point exactly (CurationQ5Spec replays the
  * full corpus against an independent per-window recompute) — but O(L)
  * instead of O(L·w), with zero per-row allocation beyond the result
  * array. Participates in whole-stage codegen via `doGenCode`.
  */
case class CdcBounds(child: Expression, w: Int, d: Long)
    extends UnaryExpression {
  require(w >= 1, "cdc window width must be >= 1")
  require(d >= 1L, "cdc divisor must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_bounds needs a string input, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcBounds.bounds(input.asInstanceOf[UTF8String], w, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CdcBounds.bounds($c, $w, ${d}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)

  override def prettyName: String = "cdc_bounds"
}

object CdcBounds {
  /** Rolling-hash boundary walk; called from generated code. */
  def bounds(s: UTF8String, w: Int, d: Long): ArrayData = {
    val str = s.toString
    // code-point array (PolyHash walks code points; positions here are
    // code-point positions, matching substr/length on the ASCII-safe
    // corpus and well-defined beyond it)
    val n0 = str.codePointCount(0, str.length)
    if (n0 < w) return new GenericArrayData(Array.empty[Int])
    val cps = new Array[Int](n0)
    var ci = 0
    var k = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(k) = cp
      k += 1
      ci += Character.charCount(cp)
    }
    val p = PolyHash.Mod
    // 31^(w-1) mod p — the removal multiplier for the leading code point
    var pow = 1L
    var e = 0
    while (e < w - 1) { pow = pow * 31L % p; e += 1 }
    var acc = 0L
    var i = 0
    while (i < w) { acc = (acc * 31L + cps(i)) % p; i += 1 }
    val out = new java.util.ArrayList[Integer]()
    // window ends at position i (1-based): cps[i-w .. i-1]
    while (true) {
      if (acc % d == 0L) out.add(Integer.valueOf(i))
      if (i == n0) {
        val arr = new Array[Int](out.size())
        var j = 0
        while (j < arr.length) { arr(j) = out.get(j).intValue(); j += 1 }
        return new GenericArrayData(arr)
      }
      acc = (((acc - cps(i - w) * pow) % p + p) % p * 31L + cps(i)) % p
      i += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
