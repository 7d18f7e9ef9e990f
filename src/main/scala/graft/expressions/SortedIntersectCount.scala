package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED distinct long arrays — the verification kernel
  * of the fuzzy-dedup path (token-set and shingle-set Jaccard).
  *
  * `size(array_intersect(a, b))` materializes the intersection array and
  * builds a hash set per call; on a 100 TB corpus the verifier runs once
  * per candidate pair (millions per partition), so allocation per pair is
  * the difference between a compute-bound and a GC-bound stage. This
  * expression merge-counts in O(|A|+|B|) with zero allocation inside
  * whole-stage codegen. Callers sort the per-doc arrays ONCE in the
  * broadcast dim (array_sort after array_distinct); cardinality — and so
  * Jaccard — is unchanged by sorting.
  *
  * Inputs must be duplicate-free and ascending; null input yields null.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count needs two array<bigint> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Size ratio beyond which probing beats merging. A linear merge costs
    * O(|A|+|B|); when one side is tiny (decontamination probes a ~25-
    * shingle document against a benchmark set that grows with the eval
    * suite), paying O(large) per row turns a map-side operator linear in
    * the BENCHMARK size — measured 5.5× wall growth at 10× data. Probing
    * costs O(small·log large) and restores corpus-linear scaling. */
  private val ProbeRatio = 32

  /** Intersection count; called from generated code. Adaptive: two-pointer
    * merge for similar sizes, binary-search probing of the smaller side
    * into the larger (with an advancing lower bound) when sizes diverge. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na > nb * ProbeRatio) probe(b, nb, a, na)
    else if (nb > na * ProbeRatio) probe(a, na, b, nb)
    else merge(a, na, b, nb)
  }

  private def merge(a: ArrayData, na: Int, b: ArrayData, nb: Int): Int = {
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Each element of `small` binary-searched in `large[lo..)`; since both
    * sides are ascending and distinct, the lower bound only moves right. */
  private def probe(small: ArrayData, ns: Int, large: ArrayData, nl: Int): Int = {
    var i = 0
    var lo = 0
    var c = 0
    while (i < ns && lo < nl) {
      val x = small.getLong(i)
      var l = lo
      var h = nl // first index in [l, nl) with large(idx) >= x
      while (l < h) {
        val m = (l + h) >>> 1
        if (large.getLong(m) < x) l = m + 1 else h = m
      }
      if (l < nl && large.getLong(l) == x) { c += 1; lo = l + 1 }
      else lo = l
      i += 1
    }
    c
  }
}
