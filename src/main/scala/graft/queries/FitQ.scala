package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import QueryDsl._

/** Closed-form model fits (SURVEY A20/A21) and the multi-resolution
  * aggregation pass (`fluxcal/lofar_fluxcal.py:807-896` re-expressed as
  * GROUPING SETS).
  *
  * Determinism note: the regression sums Σln(x), Σln(x)ln(y), … are
  * order-dependent in floating point, so both engines fold them over the
  * SAME sorted array (sort_array + sequential fold on Spark,
  * list_sort + list_reduce on DuckDB). ln itself is bitwise-identical
  * across the JVM, DuckDB and libm (verified empirically in
  * FloatDot/ProbeSpec territory); the group is bounded (≤ bucket count),
  * so the fold is per-group scalar work, not a scale risk.
  */
object FitQ {

  /** Sequential fold Σ f(e) over a sorted array of (b, c) structs. */
  private def foldSum(arr: Column, f: Column => Column): Column =
    aggregate(arr, lit(0.0), (acc, e) => acc + f(e))

  /** A20 log-log spectral index: slope of ln(count) vs ln(bucket) over
    * the 40-bucket price spectrum (`fluxcal/lofar_fluxcal.py:1040-1049`:
    * polyfit(log f, log S, 1) → spectral index α). */
  private def q58(s: SparkSession, d: String): DataFrame = {
    val spec = Tables.lineitem(s, d)
      .withColumn("b", least(floor(col("l_extendedprice") / 5000.0), lit(39L)) + 1L)
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
    val arr = sort_array(collect_list(struct(col("b"), col("c"))))
    val one = spec.agg(
      count(lit(1)).cast(DoubleType).as("n"),
      foldSum(arr, e => log(e.getField("b").cast(DoubleType))).as("sx"),
      foldSum(arr, e => log(e.getField("c").cast(DoubleType))).as("sy"),
      foldSum(arr, e => log(e.getField("b").cast(DoubleType)) *
        log(e.getField("b").cast(DoubleType))).as("sxx"),
      foldSum(arr, e => log(e.getField("b").cast(DoubleType)) *
        log(e.getField("c").cast(DoubleType))).as("sxy"))
    one.select(
      col("n").cast(LongType).as("n_points"),
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))).as("alpha"),
      ((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"))
        .as("intercept"))
  }

  private val q58Sql =
    """WITH spec AS (SELECT least(CAST(floor(l_extendedprice / 5000.0) AS BIGINT), 39) + 1 AS b,
      |    COUNT(*) AS c FROM lineitem GROUP BY 1),
      |arr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    list_sort(list({'b': b, 'c': c})) AS a FROM spec),
      |sums AS (SELECT n,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> ln(CAST(e.b AS DOUBLE)))), (acc, x) -> acc + x) AS sx,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> ln(CAST(e.c AS DOUBLE)))), (acc, x) -> acc + x) AS sy,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> ln(CAST(e.b AS DOUBLE)) * ln(CAST(e.b AS DOUBLE)))), (acc, x) -> acc + x) AS sxx,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> ln(CAST(e.b AS DOUBLE)) * ln(CAST(e.c AS DOUBLE)))), (acc, x) -> acc + x) AS sxy
      |  FROM arr)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS alpha,
      |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
      |FROM sums""".stripMargin

  /** A21 scattering-tail exponential fit: linear fit of ln(value) vs
    * sample index over a tail window → τ = −1/slope, A = exp(intercept)
    * (`get_rough_tscat.py:80-93`). The "profile" is the daily revenue
    * series; the tail window is the last 30 days of 1997. */
  private def q59(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1997-12-01") &&
        col("l_shipdate") < tsLit("1998-01-01"))
      .groupBy(dayofmonth(col("l_shipdate")).cast(LongType).as("b"))
      .agg(dsum(col("l_extendedprice")).as("c"))
    val arr = sort_array(collect_list(struct(col("b"), col("c"))))
    val one = daily.agg(
      count(lit(1)).cast(DoubleType).as("n"),
      foldSum(arr, e => e.getField("b").cast(DoubleType)).as("sx"),
      foldSum(arr, e => log(e.getField("c"))).as("sy"),
      foldSum(arr, e => e.getField("b").cast(DoubleType) *
        e.getField("b").cast(DoubleType)).as("sxx"),
      foldSum(arr, e => e.getField("b").cast(DoubleType) * log(e.getField("c"))).as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    one.select(
      col("n").cast(LongType).as("n_points"),
      slope.as("slope"),
      (lit(-1.0) / slope).as("tau"),
      exp((col("sy") - slope * col("sx")) / col("n")).as("amplitude"))
  }

  private val q59Sql = {
    val dsumRev = sqlDsum("l_extendedprice")
    """WITH daily AS (SELECT CAST(date_part('day', l_shipdate) AS BIGINT) AS b,
      |    DSUM AS c FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-12-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1),
      |arr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    list_sort(list({'b': b, 'c': c})) AS a FROM daily),
      |sums AS (SELECT n,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> CAST(e.b AS DOUBLE))), (acc, x) -> acc + x) AS sx,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> ln(e.c))), (acc, x) -> acc + x) AS sy,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> CAST(e.b AS DOUBLE) * CAST(e.b AS DOUBLE))), (acc, x) -> acc + x) AS sxx,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, e -> CAST(e.b AS DOUBLE) * ln(e.c))), (acc, x) -> acc + x) AS sxy
      |  FROM arr)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |  -1.0 / ((n * sxy - sx * sy) / (n * sxx - sx * sx)) AS tau,
      |  exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) AS amplitude
      |FROM sums""".stripMargin.replace("DSUM", dsumRev)
  }

  /** The multi-resolution spectrum pass: the reference re-aggregates the
    * same spectrum at several channel granularities in a loop
    * (`fluxcal/lofar_fluxcal.py:807-896`); one GROUPING SETS pass
    * produces all three resolutions (k = 1, 4, 16 bucket widths) in a
    * single shuffle. */
  private def q60(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .withColumn("b", least(floor(col("l_extendedprice") / 5000.0), lit(39L)))
      .withColumn("b4", floor(col("b") / 4L))
      .withColumn("b16", floor(col("b") / 16L))
    li.createOrReplaceTempView("li_multires")
    s.sql(s"""SELECT grouping(b) AS g1, grouping(b4) AS g4, grouping(b16) AS g16,
      b, b4, b16, COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS total
      FROM li_multires
      GROUP BY GROUPING SETS ((b), (b4), (b16))
      ORDER BY g1, g4, g16, b, b4, b16""")
  }

  private val q60Sql =
    s"""WITH li AS (SELECT l_extendedprice,
       |    least(CAST(floor(l_extendedprice / 5000.0) AS BIGINT), 39) AS b FROM lineitem),
       |li2 AS (SELECT l_extendedprice, b, b // 4 AS b4, b // 16 AS b16 FROM li)
       |SELECT CAST(grouping(b) AS TINYINT) AS g1, CAST(grouping(b4) AS TINYINT) AS g4,
       |  CAST(grouping(b16) AS TINYINT) AS g16,
       |  b, b4, b16, COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS total
       |FROM li2
       |GROUP BY GROUPING SETS ((b), (b4), (b16))
       |ORDER BY g1, g4, g16, b, b4, b16""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q58_spectral_index", q58, Some(q58Sql), Seq("A20")),
    GQuery("q59_scatter_tail_fit", q59, Some(q59Sql), Seq("A21")),
    GQuery("q60_multires_spectrum", q60, Some(q60Sql), Seq("A3", "A1")))
}
