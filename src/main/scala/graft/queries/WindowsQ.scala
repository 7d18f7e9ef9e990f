package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import QueryDsl._

/** Ordered analytics — gap-and-island sessionization, matched filters,
  * detrending, sorted-gap cuts, sigma clipping, set ops, grouping sets.
  * Reference semantics: `fluxcal/snr.py:70-99` (trim_bins), `pulse_info.py:
  * 114-187` (boxcar search), `pulsestack.py:47-97` (detrend + bad-chunk),
  * `subdyn.py:447-469` (sigma clip).
  */
object WindowsQ {

  /** W1 gap-and-island: distinct high-quantity part keys → sessionize on
    * key gaps > 1 → keep islands with ≥ 2 members (trim_bins drops 1-bin
    * outliers, `fluxcal/snr.py:70-99`).
    *
    * Uses the two-level `Islands.consecutive` operator: the key set grows
    * with the fact table, so a `Window.orderBy` with no partition (single
    * partition, 5.6× wall growth at 10× data in ScaleCheck) is replaced by
    * bucket-local sessionization + an edge-island chain merge. The oracle
    * keeps the one-window SQL form as an independent derivation. */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 48)
      .select(col("l_partkey").as("k")).distinct()
    graft.operators.Islands.consecutive(keys, "k")
      .filter(col("n_members") >= 2)
      .select(col("island_start"), col("island_end"), col("n_members"))
      .orderBy(col("island_start"))
  }

  private val q11Sql =
    """WITH keys AS (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity >= 48),
      |flagged AS (SELECT k,
      |  CASE WHEN k - lag(k) OVER (ORDER BY k) = 1 THEN 0 ELSE 1 END AS gap FROM keys),
      |islands AS (SELECT k, SUM(gap) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM flagged)
      |SELECT MIN(k) AS island_start, MAX(k) AS island_end, COUNT(*) AS n_members
      |FROM islands GROUP BY island HAVING COUNT(*) >= 2
      |ORDER BY island_start""".stripMargin

  /** W3 multi-scale boxcar matched filter over the daily revenue series:
    * moving exact-decimal sums at widths {2,3,4,6}, score = sum/sqrt(w),
    * best (width, score) per day (`pulse_info.py:114-116,169-187`). */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val daily = li.groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(d2(col("l_extendedprice"))).as("rev"))
    val widths = Seq(2, 3, 4, 6)
    val base = Window.orderBy(col("day"))
    val scored = widths.foldLeft(daily) { (df, wd) =>
      df.withColumn(s"s$wd",
        (sum(col("rev")).over(base.rowsBetween(0, wd - 1)).cast(DoubleType) /
          lit(math.sqrt(wd.toDouble))))
    }
    val bestScore = widths.map(wd => col(s"s$wd")).reduce((a, b) => greatest(a, b))
    val bestWidth = widths.reverse.foldLeft(lit(0)) { (acc, wd) =>
      when(col(s"s$wd") === bestScore, lit(wd)).otherwise(acc)
    }
    scored
      .withColumn("best_score", bestScore)
      .withColumn("best_width", bestWidth)
      .select(col("day"), col("rev").cast(DoubleType).as("rev"),
        col("best_width"), col("best_score"))
      .orderBy(col("day"))
  }

  private val q12Sql = {
    val mov = (w: Int) =>
      s"CAST(SUM(rev) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS DOUBLE) / sqrt(${w}.0)"
    s"""WITH daily AS (
       |  SELECT CAST(l_shipdate AS DATE) AS day, SUM(${sqlD2("l_extendedprice")}) AS rev
       |  FROM lineitem GROUP BY 1),
       |scored AS (SELECT day, rev,
       |  ${mov(2)} AS s2, ${mov(3)} AS s3, ${mov(4)} AS s4, ${mov(6)} AS s6
       |  FROM daily)
       |SELECT day, CAST(rev AS DOUBLE) AS rev,
       |  CASE greatest(s2,s3,s4,s6) WHEN s2 THEN 2 WHEN s3 THEN 3 WHEN s4 THEN 4 ELSE 6 END AS best_width,
       |  greatest(s2,s3,s4,s6) AS best_score
       |FROM scored ORDER BY day""".stripMargin
  }

  /** W7 piecewise linear detrend: per 200-event chunk, closed-form
    * least-squares slope/intercept from exact decimal/bigint sums
    * (`pulsestack.py:47-97`). */
  private def q13(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val x = col("event_id")
    val grouped = ev.withColumn("chunk", floor(x / 200L))
      .groupBy(col("chunk"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(d2(col("value"))).cast(DoubleType).as("sy"),
        sum((x.cast(DecimalType(18, 0)) * d2(col("value"))).cast(DecimalType(38, 2)))
          .cast(DoubleType).as("sxy"))
    grouped
      .withColumn("slope", (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / col("n"))
      .select(col("chunk"), col("n").cast(LongType).as("n"), col("slope"), col("intercept"))
      .orderBy(col("chunk"))
  }

  private val q13Sql =
    s"""WITH g AS (
       |  SELECT event_id // 200 AS chunk,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(event_id) AS DOUBLE) AS sx,
       |    CAST(SUM(event_id * event_id) AS DOUBLE) AS sxx,
       |    CAST(SUM(${sqlD2("value")}) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(CAST(event_id AS DECIMAL(18,0)) * ${sqlD2("value")} AS DECIMAL(38,2))) AS DOUBLE) AS sxy
       |  FROM events GROUP BY 1)
       |SELECT chunk, CAST(n AS BIGINT) AS n,
       |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
       |FROM g ORDER BY chunk""".stripMargin

  /** W6/A13 sorted-gap cut: per-chunk population std of event values,
    * rank by std, successive diffs, flag the max-gap position
    * (`pulsestack.py:79-91`). */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val chunks = ev.withColumn("chunk", floor(col("event_id") / 100L))
      .groupBy(col("chunk"))
      .agg(sqrt(dvarPop(col("value"))).as("std"))
    val w = Window.orderBy(col("std"), col("chunk"))
    chunks
      .withColumn("rk", row_number().over(w))
      .withColumn("gap", col("std") - lag(col("std"), 1).over(w))
      .filter(col("gap").isNotNull)
      .select(col("rk"), col("chunk"), col("std"), col("gap"))
      .orderBy(col("rk"))
  }

  private val q14Sql =
    s"""WITH chunks AS (
       |  SELECT event_id // 100 AS chunk, sqrt(${sqlDvarPop("value")}) AS std
       |  FROM events GROUP BY 1),
       |ranked AS (SELECT chunk, std,
       |  ROW_NUMBER() OVER (ORDER BY std, chunk) AS rk,
       |  std - lag(std) OVER (ORDER BY std, chunk) AS gap
       |  FROM chunks)
       |SELECT rk, chunk, std, gap FROM ranked WHERE gap IS NOT NULL ORDER BY rk""".stripMargin

  /** A14 sigma-clip mask: per-user robust level flags, clipped fraction
    * (`subdyn.py:447-469`). */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val stats = ev.groupBy(col("user_id"))
      .agg(davg(col("value")).as("mean"), sqrt(dvarPop(col("value"))).as("std"),
        count(lit(1)).as("n"))
    ev.join(broadcast(stats), "user_id")
      .withColumn("clipped", when(abs(col("value") - col("mean")) > lit(2.0) * col("std"), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"), sum(col("clipped")).as("n_clipped"),
        (sum(col("clipped")).cast(DoubleType) / max(col("n")).cast(DoubleType)).as("clip_frac"))
      .orderBy(col("user_id"))
  }

  private val q15Sql =
    s"""WITH stats AS (
       |  SELECT user_id, ${sqlDavg("value")} AS mean, sqrt(${sqlDvarPop("value")}) AS std, COUNT(*) AS n
       |  FROM events GROUP BY user_id)
       |SELECT e.user_id AS user_id, MAX(s.n) AS n_events,
       |  CAST(SUM(CASE WHEN abs(e.value - s.mean) > 2.0 * s.std THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       |  CAST(SUM(CASE WHEN abs(e.value - s.mean) > 2.0 * s.std THEN 1 ELSE 0 END) AS DOUBLE) / CAST(MAX(s.n) AS DOUBLE) AS clip_frac
       |FROM events e JOIN stats s ON e.user_id = s.user_id
       |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin

  /** A18 histogram: fixed-grid buckets over extended price
    * (`fluxcal/snr.py:540`, `subdyn.py:306-324`). */
  private def q16(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("bucket", least(floor(col("l_extendedprice") / 5000.0), lit(39L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
      .orderBy(col("bucket"))

  private val q16Sql =
    s"""SELECT least(CAST(floor(l_extendedprice / 5000.0) AS BIGINT), 39) AS bucket,
       |  COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS total
       |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  /** U2 set difference: customers active in 1996 but not 1997. */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def active(y: String, y1: String) =
      o.filter(col("o_orderdate") >= tsLit(s"$y-01-01") && col("o_orderdate") < tsLit(s"$y1-01-01"))
        .select(col("o_custkey"))
    active("1996", "1997").except(active("1997", "1998"))
      .orderBy(col("o_custkey"))
  }

  private val q17Sql =
    """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |ORDER BY o_custkey""".stripMargin

  /** U4 set intersection: customers active in both years. */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def active(y: String, y1: String) =
      o.filter(col("o_orderdate") >= tsLit(s"$y-01-01") && col("o_orderdate") < tsLit(s"$y1-01-01"))
        .select(col("o_custkey"))
    active("1996", "1997").intersect(active("1997", "1998"))
      .orderBy(col("o_custkey"))
  }

  private val q18Sql =
    """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |ORDER BY o_custkey""".stripMargin

  /** Grouping sets / rollup — multi-resolution aggregation in one pass
    * (the spectrum-at-multiple-resolutions loop,
    * `fluxcal/lofar_fluxcal.py:807-896`). */
  private def q19(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_rf"), grouping(col("l_linestatus")).as("g_ls"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("g_rf").cast(IntegerType).as("g_rf"), col("g_ls").cast(IntegerType).as("g_ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))

  private val q19Sql =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY g_rf, g_ls, rf, ls""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q11_islands", q11, Some(q11Sql), Seq("W1", "W2")),
    GQuery("q12_boxcar_filter", q12, Some(q12Sql), Seq("W3")),
    GQuery("q13_detrend", q13, Some(q13Sql), Seq("W7", "A20")),
    GQuery("q14_sorted_gap_cut", q14, Some(q14Sql), Seq("W6", "A13")),
    GQuery("q15_sigma_clip", q15, Some(q15Sql), Seq("A14", "F6")),
    GQuery("q16_histogram", q16, Some(q16Sql), Seq("A18")),
    GQuery("q17_set_difference", q17, Some(q17Sql), Seq("U2")),
    GQuery("q18_set_intersect", q18, Some(q18Sql), Seq("U4", "U3")),
    GQuery("q19_rollup", q19, Some(q19Sql), Seq("A1", "A3")))
}
