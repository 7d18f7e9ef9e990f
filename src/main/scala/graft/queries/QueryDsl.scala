package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Helpers shared by the query battery.
  *
  * Exact-arithmetic discipline: test-table money/quantity columns are
  * doubles holding 2-decimal values. Summing doubles is order-dependent
  * (Spark and the DuckDB oracle would disagree in the last bits), so every
  * aggregated measure is cast to DECIMAL *before* arithmetic — decimal
  * sums are exact and associative, and the final cast back to DOUBLE is
  * deterministic on both engines.
  */
object QueryDsl {
  /** 2-decimal money/quantity column → exact decimal. */
  def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum surfaced as double. */
  def dsum(c: Column): Column = sum(d2(c)).cast(DoubleType)

  /** Exact decimal mean surfaced as double (sum_decimal / count). */
  def davg(c: Column): Column =
    sum(d2(c)).cast(DoubleType) / count(c).cast(DoubleType)

  /** Population variance via exact sums: (Σx² − (Σx)²/n)/n.
    * x has 2 decimals → x² has 4 → DECIMAL(38,4) sums stay exact. */
  def dvarPop(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val sx = sum(d2(c)).cast(DoubleType)
    val sxx = sum((d2(c) * d2(c)).cast(DecimalType(38, 4))).cast(DoubleType)
    (sxx - sx * sx / n) / n
  }

  /** Matching DuckDB SQL fragments for the same exact-arithmetic forms. */
  def sqlD2(e: String): String = s"CAST($e AS DECIMAL(18,2))"
  def sqlDsum(e: String): String = s"CAST(SUM(${sqlD2(e)}) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(SUM(${sqlD2(e)}) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)"
  def sqlDvarPop(e: String): String = {
    val sx = s"CAST(SUM(${sqlD2(e)}) AS DOUBLE)"
    val sxx = s"CAST(SUM(CAST(${sqlD2(e)} * ${sqlD2(e)} AS DECIMAL(38,4))) AS DOUBLE)"
    val n = s"CAST(COUNT($e) AS DOUBLE)"
    s"(($sxx) - ($sx) * ($sx) / ($n)) / ($n)"
  }

  /** timestamp_ntz literal for date filters. */
  def tsLit(s: String): Column = lit(s).cast(TimestampNTZType)
}
