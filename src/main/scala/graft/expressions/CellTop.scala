package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._

/** `cell_top(v, cvecs, cnorms, nprobe)` → the top-`nprobe` coarse cells
  * of one embedding, best-first — the map-side replacement for the
  * crossJoin(broadcast centroids) + `row_number() over (partition by id
  * order by cos desc, cid asc)` assignment plan (`KMeans.assignTop`,
  * every Lloyd round, `VecIndex.build`): those paid a local sort of n·k
  * rows plus an n-row exchange per call — per ITERATION in the trainer,
  * there carrying the embedding arrays — for an argmax each row can
  * compute alone (the `pq_encode` precedent, round 13).
  *
  * Returns `array<struct<cos double, pos int>>` where `pos` indexes the
  * caller's cid-SORTED centroid arrays (the caller maps pos → cid, so
  * pos-ascending tie-breaks ARE cid-ascending). Bitwise discipline:
  *  - the cosine is `float_dot(v, c) / (sqrt(float_dot(v, v)) · cnorm)`
  *    with [[FloatDot.dot]]'s exact left-to-right double accumulation —
  *    the same expression tree the window plan evaluated;
  *  - selection order is descending [[SQLOrderingUtil.compareDoubles]]
  *    (ties → lower pos), which IS the SortOrder comparator of the
  *    replaced window (NaN greatest and self-equal, −0.0 = 0.0), so the
  *    selected cells and their order match the window's bitwise;
  *  - a null cosine (null centroid entry / length mismatch) sorts last
  *    (the window's descending NULLS LAST), preserved in the output.
  * A null/null-element `v` yields null (the caller's norm filter already
  * dropped such rows in every consumer). Fewer than `nprobe` cells
  * yield all of them — `row_number <= nprobe` semantics.
  */
case class CellTop(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = CellTop.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _),
            ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "cell_top needs (array<float>, array<array<float>>, array<double>, " +
          s"int), got ${a.catalogString}, ${b.catalogString}, " +
          s"${c.catalogString}, ${d.catalogString}")
    }

  override protected def nullSafeEval(v: Any, ce: Any, cn: Any, np: Any): Any =
    CellTop.top(v.asInstanceOf[ArrayData], ce.asInstanceOf[ArrayData],
      cn.asInstanceOf[ArrayData], np.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, ce, cn, np) => {
      // freshName: with all-non-nullable children the block is emitted
      // unbraced, so a fixed local name would collide when two cell_top
      // calls share one codegen function (silent interpreted fallback)
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.CellTop.top($v, $ce, $cn, $np);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): CellTop =
    copy(f, s, t, q)
  override def prettyName: String = "cell_top"
}

object CellTop {
  private[expressions] val outType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType, nullable = true),
    StructField("pos", IntegerType, nullable = false))))

  /** Descending-cosine, ascending-position "strictly better" — the
    * window's (cos desc, cid asc) SortOrder over cid-sorted positions. */
  private def better(a: java.lang.Double, ai: Int,
                     b: java.lang.Double, bi: Int): Boolean =
    if (a == null && b == null) ai < bi
    else if (a == null) false
    else if (b == null) true
    else {
      val c = SQLOrderingUtil.compareDoubles(a.doubleValue(), b.doubleValue())
      if (c != 0) c > 0 else ai < bi
    }

  /** Called from generated code. Null on a null-element/null `v`. */
  def top(v: ArrayData, cvecs: ArrayData, cnorms: ArrayData,
          nprobe: Int): ArrayData = {
    val k = cvecs.numElements()
    if (cnorms.numElements() != k || nprobe < 1) return null
    val selfDot = FloatDot.dot(v, v)
    if (selfDot == null) return null
    val norm = math.sqrt(selfDot.doubleValue())
    val cos = new Array[java.lang.Double](k)
    var i = 0
    while (i < k) {
      val d =
        if (cvecs.isNullAt(i) || cnorms.isNullAt(i)) null
        else FloatDot.dot(v, cvecs.getArray(i))
      if (d != null)
        cos(i) = java.lang.Double.valueOf(
          d.doubleValue() / (norm * cnorms.getDouble(i)))
      i += 1
    }
    val m = math.min(nprobe, k)
    val taken = new Array[Boolean](k)
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!taken(j) && (best < 0 || better(cos(j), j, cos(best), best)))
          best = j
        j += 1
      }
      taken(best) = true
      out(r) = new GenericInternalRow(Array[Any](cos(best), best))
      r += 1
    }
    new GenericArrayData(out)
  }
}
