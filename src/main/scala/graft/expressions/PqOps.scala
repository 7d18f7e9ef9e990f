package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernel family — the map-side replacement for the
  * join+window PQ plan (q87/q90/q93, `lofar_fluxcal.py`-era profile math
  * has no analog here; this is the training-data ANN path).
  *
  * The original encode was `subspaces × codebook` (a ×k row blowup) plus
  * a `row_number` window at (vec, subspace) grain — two shuffles whose
  * input grows k-fold faster than the corpus. These kernels do the same
  * arithmetic inside whole-stage codegen at (vec) grain: the codebook
  * collapses to ONE broadcast row of j-ordered, cid-ordered nested
  * arrays, and encode/distance-table/ADC are pure per-row loops. At
  * 100 TB the corpus-side cost is one scan producing m small ints per
  * vector — the compressed representation PQ exists to produce.
  *
  * IEEE discipline (the q58/q59 sorted-fold rule): every distance is the
  * expanded form `(‖x‖² − 2⟨x,c⟩) + ‖c‖²` with the self-dot accumulated
  * first and all dots folded strictly left-to-right in double — the
  * bitwise-identical expression tree of `PQ.d2Expr` and the DuckDB
  * oracles' `sqlDotFold`. ADC and the exact subspace-L2 fold per-subspace
  * terms in ascending-j order from a 0.0 accumulator, matching
  * `list_reduce(list_prepend(0.0, list(... ORDER BY j)))`.
  */
object PqOps {

  /** ‖sub‖² of the j-th dsub-slice of vec, left-to-right. -1 on null
    * elements (callers translate to SQL null via the boxed wrappers). */
  private def selfDot(vec: ArrayData, off: Int, dsub: Int): Double = {
    var ss = 0.0
    var d = 0
    while (d < dsub) {
      val x = vec.getFloat(off + d).toDouble
      ss += x * x
      d += 1
    }
    ss
  }

  private def subCentDot(vec: ArrayData, off: Int, cent: ArrayData): Double = {
    val dsub = cent.numElements()
    var acc = 0.0
    var d = 0
    while (d < dsub) {
      acc += vec.getFloat(off + d).toDouble * cent.getFloat(d).toDouble
      d += 1
    }
    acc
  }

  private def anyNull(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** argmin cell position per subspace (ties → earliest = lowest cid,
    * the `ORDER BY d2 ASC, c_id ASC` row_number convention; a leading
    * NaN loses to any later non-NaN, matching NaN-sorts-last). Returns
    * null on ragged input (vec length not m×dsub, null elements). */
  def encode(vec: ArrayData, cents: ArrayData, ccs: ArrayData): ArrayData = {
    val m = cents.numElements()
    if (m == 0 || ccs.numElements() != m || anyNull(vec)) return null
    val dsub = {
      val c0 = cents.getArray(0)
      if (c0.numElements() == 0) return null
      c0.getArray(0).numElements()
    }
    if (vec.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cellsJ = cents.getArray(j)
      val ccJ = ccs.getArray(j)
      val k = cellsJ.numElements()
      if (k == 0 || ccJ.numElements() != k) return null
      val off = j * dsub
      val ss = selfDot(vec, off, dsub)
      var bestPos = 0
      var best = (ss - 2.0 * subCentDot(vec, off, cellsJ.getArray(0))) +
        ccJ.getDouble(0)
      var i = 1
      while (i < k) {
        val d2 = (ss - 2.0 * subCentDot(vec, off, cellsJ.getArray(i))) +
          ccJ.getDouble(i)
        if (d2 < best || (java.lang.Double.isNaN(best) &&
            !java.lang.Double.isNaN(d2))) {
          best = d2; bestPos = i
        }
        i += 1
      }
      codes(j) = bestPos
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Probe-side asymmetric distance table: dtab[j][i] = ‖qⱼ − cᵢⱼ‖² for
    * every (subspace, cell), same expanded-form arithmetic as encode. */
  def distTable(vec: ArrayData, cents: ArrayData, ccs: ArrayData): ArrayData = {
    val m = cents.numElements()
    if (m == 0 || ccs.numElements() != m || anyNull(vec)) return null
    val dsub = {
      val c0 = cents.getArray(0)
      if (c0.numElements() == 0) return null
      c0.getArray(0).numElements()
    }
    if (vec.numElements() != m * dsub) return null
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cellsJ = cents.getArray(j)
      val ccJ = ccs.getArray(j)
      val k = cellsJ.numElements()
      if (k == 0 || ccJ.numElements() != k) return null
      val off = j * dsub
      val ss = selfDot(vec, off, dsub)
      val dj = new Array[Double](k)
      var i = 0
      while (i < k) {
        dj(i) = (ss - 2.0 * subCentDot(vec, off, cellsJ.getArray(i))) +
          ccJ.getDouble(i)
        i += 1
      }
      rows(j) = new GenericArrayData(dj)
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** ADC: Σⱼ dtab[j][codes[j]], folded in ascending-j order from 0.0. */
  def adc(codes: ArrayData, dtab: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (dtab.numElements() != m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || dtab.isNullAt(j)) return null
      val dj = dtab.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= dj.numElements() || dj.isNullAt(c)) return null
      acc += dj.getDouble(c)
      j += 1
    }
    acc
  }

  /** Exact ‖x − q‖² as the ascending-j fold of per-subspace expanded
    * distances — the ground-truth side of the recall harness, bitwise
    * equal to summing `(ssⱼ − 2⟨xⱼ,qⱼ⟩) + qssⱼ` over a j-ordered list. */
  def subspaceL2(vec: ArrayData, q: ArrayData, m: Int): java.lang.Double = {
    val n = vec.numElements()
    if (m <= 0 || n != q.numElements() || n % m != 0) return null
    if (anyNull(vec) || anyNull(q)) return null
    val dsub = n / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      val off = j * dsub
      val ss = selfDot(vec, off, dsub)
      var dot = 0.0
      var d = 0
      while (d < dsub) {
        dot += vec.getFloat(off + d).toDouble * q.getFloat(off + d).toDouble
        d += 1
      }
      val qss = selfDot(q, off, dsub)
      acc += (ss - 2.0 * dot) + qss
      j += 1
    }
    acc
  }

  private[expressions] val floatArr = ArrayType(FloatType)
  private[expressions] def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private[expressions] def isNestedFloat(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
    case _ => false
  }
  private[expressions] def isNestedDouble(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }
}

/** `pq_encode(vec, cents, ccs)` → array<int> of argmin cell POSITIONS
  * (index into the cid-sorted per-subspace cell list), one per subspace.
  * cents: array[j][i] of centroid sub-vectors, ccs: array[j][i] = ‖c‖². */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqOps.isFloatArr(first.dataType) && PqOps.isNestedFloat(second.dataType) &&
        PqOps.isNestedDouble(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_encode needs (array<float>, array<array<array<float>>>, " +
        s"array<array<double>>), got ${first.dataType.catalogString}, " +
        s"${second.dataType.catalogString}, ${third.dataType.catalogString}")

  override protected def nullSafeEval(v: Any, ce: Any, cc: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], ce.asInstanceOf[ArrayData],
      cc.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, ce, cc) => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.PqOps.encode($v, $ce, $cc);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqEncode = copy(f, s, t)
  override def prettyName: String = "pq_encode"
}

/** `pq_dtab(qvec, cents, ccs)` → array<array<double>> asymmetric
  * distance table for one probe. */
case class PqDistTable(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(ArrayType(DoubleType))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqOps.isFloatArr(first.dataType) && PqOps.isNestedFloat(second.dataType) &&
        PqOps.isNestedDouble(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_dtab needs (array<float>, array<array<array<float>>>, " +
        s"array<array<double>>), got ${first.dataType.catalogString}, " +
        s"${second.dataType.catalogString}, ${third.dataType.catalogString}")

  override protected def nullSafeEval(v: Any, ce: Any, cc: Any): Any =
    PqOps.distTable(v.asInstanceOf[ArrayData], ce.asInstanceOf[ArrayData],
      cc.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, ce, cc) => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.PqOps.distTable($v, $ce, $cc);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqDistTable = copy(f, s, t)
  override def prettyName: String = "pq_dtab"
}

/** `pq_adc(codes, dtab)` → double approximate squared distance. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), t) if PqOps.isNestedDouble(t) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<int>, array<array<double>>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqOps.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Double $r = graft.expressions.PqOps.adc($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

/** `float_sub(a, b)` → elementwise float32 difference — the residual
  * step of IVF-PQ (vec − coarse centroid). Single-rounded float
  * subtraction, bitwise equal to `CAST(a[i] − b[i] AS FLOAT)` whether an
  * engine subtracts in float or promotes to double first (a double
  * difference of two floats rounds to the same float). Mismatched
  * lengths / null elements → null. */
case class FloatSub(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_sub needs two array<float> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatSub.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.FloatSub.sub($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSub =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_sub"
}

object FloatSub {
  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      out(i) = a.getFloat(i) - b.getFloat(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `subspace_l2(vec, qvec, m)` → exact ‖x−q‖² folded per-subspace in
  * ascending-j order (the recall harness's ground-truth arithmetic). */
case class SubspaceL2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"subspace_l2 needs (array<float>, array<float>, int), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any =
    PqOps.subspaceL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val r = ctx.freshName("r")
      s"""
         |Double $r = graft.expressions.PqOps.subspaceL2($a, $b, $m);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SubspaceL2 = copy(f, s, t)
  override def prettyName: String = "subspace_l2"
}
