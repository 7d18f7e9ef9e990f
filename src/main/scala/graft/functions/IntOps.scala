package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact 64-bit integer helpers for the fixed-point score discipline:
  * where a score cannot be kept as a single integer ratio (BM25's
  * per-term sum, interpolated LM mixtures), the engine quantizes each
  * term with an INTEGER division at a documented scale instead of
  * summing IEEE doubles — integer ops are exact and associative on
  * every engine, so the quantized scores are order-free and bitwise
  * portable, with only the caller's final display division producing a
  * double.
  */
object IntOps {

  /** Integer division `a div b` (Spark `div`, DuckDB `//`) as a Column —
    * exact in 64-bit, null on b = 0 (non-ANSI). Both engines TRUNCATE
    * TOWARD ZERO, so they agree for negative operands too — which the
    * fixed-point discipline relies on: BM25's rational idf numerator
    * (2N − 2df + 1) goes NEGATIVE whenever df > N/2 (the registered
    * q111/q113/q120 hit this on the harness vocabulary with the df
    * prune wide open), and the negative per-term scores still match the
    * oracle bit-for-bit because both engines round the quotient toward
    * zero rather than toward −∞. */
  def idiv(a: Column, b: Column): Column =
    ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
