package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.AstroFunctions._
import QueryDsl._

/** Pulsar-domain operator battery (SURVEY.md §2.8 scalar pack + the
  * remaining §2.4/§2.5 aggregations): sexagesimal parsing, Tinst
  * polynomial range-averaging, dispersion delays, pulsar physics,
  * radiometer sensitivity, fixed-format TOA rendering, filename surgery,
  * fixed-width dimension parsing + Tsky bucket join, rank-based robust
  * stats, closed-form polynomial baseline, exact integer 2-D ACF, and
  * profile statistics.
  *
  * Every compared column uses only bitwise-portable ops (+ − × /, sqrt,
  * integer, string) with identical expression trees on Spark and DuckDB;
  * decimal casts make every aggregation order-independent.
  */
object DomainQ {

  // --- q36: C1/C13 sexagesimal render + parse round trip ----------------

  private def q36(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    def z(c0: Column, n: Int) = lpad(c0.cast(StringType), n, "0")
    val hi = col("c_custkey") % 24
    val mi = (col("c_custkey") * 7) % 60
    val si = (col("c_custkey") * 13) % 600 // tenths of arc-seconds
    val dd = col("c_custkey") % 90
    val dmi = (col("c_custkey") * 3) % 60
    val dsi = (col("c_custkey") * 11) % 60
    val sgn = when(col("c_custkey") % 2 === 0, "+").otherwise("-")
    c.withColumn("ra_str", concat(z(hi, 2), lit(":"), z(mi, 2), lit(":"),
        z((si / 10).cast(LongType), 2), lit("."), (si % 10).cast(StringType)))
      .withColumn("dec_str", concat(sgn, z(dd, 2), lit(":"), z(dmi, 2),
        lit(":"), z(dsi, 2)))
      .withColumn("ra_deg", raToDeg(col("ra_str")))
      .withColumn("dec_deg", decToDeg(col("dec_str")))
      .select(col("c_custkey"), col("ra_str"), col("dec_str"),
        col("ra_deg"), col("dec_deg"))
      .orderBy(col("c_custkey"))
  }

  private val q36Sql = {
    val raStr = "concat(lpad(CAST(c_custkey % 24 AS VARCHAR), 2, '0'), ':', " +
      "lpad(CAST((c_custkey * 7) % 60 AS VARCHAR), 2, '0'), ':', " +
      "lpad(CAST(((c_custkey * 13) % 600) // 10 AS VARCHAR), 2, '0'), '.', " +
      "CAST(((c_custkey * 13) % 600) % 10 AS VARCHAR))"
    val decStr = "concat(CASE WHEN c_custkey % 2 = 0 THEN '+' ELSE '-' END, " +
      "lpad(CAST(c_custkey % 90 AS VARCHAR), 2, '0'), ':', " +
      "lpad(CAST((c_custkey * 3) % 60 AS VARCHAR), 2, '0'), ':', " +
      "lpad(CAST((c_custkey * 11) % 60 AS VARCHAR), 2, '0'))"
    s"""WITH t AS (SELECT c_custkey, $raStr AS ra_str, $decStr AS dec_str FROM customer)
       |SELECT c_custkey, ra_str, dec_str,
       |  ${sqlRaToDeg("ra_str")} AS ra_deg,
       |  ${sqlDecToDeg("dec_str")} AS dec_deg
       |FROM t ORDER BY c_custkey""".stripMargin
  }

  // --- q37: C7 Tinst Horner polynomial + 101-point range average --------

  private def q37(s: SparkSession, d: String): DataFrame = {
    val grid = Tables.part(s, d)
      .select((col("p_partkey") % 28).cast(IntegerType).as("fi")).distinct()
      .withColumn("f", lit(110.0) + col("fi").cast(DoubleType) * lit(5.0))
    // deterministic left fold over the 101-point grid — order-pinned sum
    val pts = transform(sequence(lit(0), lit(100)),
      i => horner(col("f") + i.cast(DoubleType) * lit(0.05), TinstHbaCoeffs))
    grid
      .withColumn("tinst_center", tinstHba(col("f")))
      .withColumn("tinst_avg",
        aggregate(pts, lit(0.0), (acc, x) => acc + x) / lit(101.0))
      .select(col("fi"), col("f"), col("tinst_center"), col("tinst_avg"))
      .orderBy(col("fi"))
  }

  private val q37Sql = {
    val h = sqlHorner("f + i * 0.05", TinstHbaCoeffs)
    s"""WITH grid AS (
       |  SELECT DISTINCT CAST(p_partkey % 28 AS INT) AS fi FROM part),
       |f AS (SELECT fi, 110.0 + CAST(fi AS DOUBLE) * 5.0 AS f FROM grid)
       |SELECT fi, f,
       |  ${sqlTinstHba("f")} AS tinst_center,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(0, 101), i -> $h)), (acc, x) -> acc + x) / 101.0 AS tinst_avg
       |FROM f ORDER BY fi""".stripMargin
  }

  // --- q38: C10/F11 dispersion delays over the channel grid -------------

  private def q38(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("dm", col("value"))
      .withColumn("chan", (col("user_id") % 128).cast(IntegerType))
      .withColumn("flo", chanFreq(lit(100.0), col("chan"), lit(0.1953125)))
      .withColumn("chan_smear_ms",
        dispersionDelayMs(col("dm"), lit(0.1953125), col("flo")))
      .withColumn("delay_to_top_ms",
        dispersionPairMs(col("dm"), col("flo"), lit(200.0)))
      .select(col("event_id"), col("dm"), col("chan"), col("flo"),
        col("chan_smear_ms"), col("delay_to_top_ms"))
      .orderBy(col("event_id"))

  private val q38Sql =
    s"""WITH e AS (SELECT event_id, value AS dm,
       |    CAST(user_id % 128 AS INT) AS chan,
       |    100.0 + CAST(CAST(user_id % 128 AS INT) AS DOUBLE) * 0.1953125 AS flo
       |  FROM events)
       |SELECT event_id, dm, chan, flo,
       |  ${sqlDispersionDelayMs("dm", "0.1953125", "flo")} AS chan_smear_ms,
       |  ${sqlDispersionPairMs("dm", "flo", "200.0")} AS delay_to_top_ms
       |FROM e ORDER BY event_id""".stripMargin

  // --- q39: C11 pulsar derived quantities -------------------------------

  private def q39(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("p", col("p_retailprice") / lit(1000.0))
      .withColumn("pdot15", ((col("p_partkey") % 100) + 1).cast(DoubleType))
      .select(col("p_partkey"), col("p"), col("pdot15"),
        charAgeMyr(col("p"), col("pdot15")).as("tau_myr"),
        edot(col("p"), col("pdot15")).as("edot"),
        bSurf(col("p"), col("pdot15")).as("b_surf"),
        bLc(col("p"), col("pdot15")).as("b_lc"),
        nGj(col("p"), col("pdot15")).as("n_gj"),
        rPolarCap(col("p")).as("r_pc"),
        rLc(col("p")).as("r_lc"),
        dPhi(col("p"), col("pdot15")).as("d_phi"),
        (lit(1.0) / col("p")).as("f_hz"))
      .orderBy(col("p_partkey"))

  private val q39Sql =
    s"""WITH t AS (SELECT p_partkey, p_retailprice / 1000.0 AS p,
       |    CAST((p_partkey % 100) + 1 AS DOUBLE) AS pdot15 FROM part)
       |SELECT p_partkey, p, pdot15,
       |  ${sqlCharAgeMyr("p", "pdot15")} AS tau_myr,
       |  ${sqlEdot("p", "pdot15")} AS edot,
       |  ${sqlBSurf("p", "pdot15")} AS b_surf,
       |  ${sqlBLc("p", "pdot15")} AS b_lc,
       |  ${sqlNGj("p", "pdot15")} AS n_gj,
       |  ${sqlRPolarCap("p")} AS r_pc,
       |  ${sqlRLc("p")} AS r_lc,
       |  ${sqlDPhi("p", "pdot15")} AS d_phi,
       |  (1.0 / p) AS f_hz
       |FROM t ORDER BY p_partkey""".stripMargin

  // --- q40: C9 radiometer sensitivity (coherent + incoherent tiers) -----

  private def q40(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .withColumn("nstat", ((col("s_suppkey") % 50) + 20).cast(DoubleType))
      .withColumn("badfrac",
        ((col("s_suppkey") * 13) % 30).cast(DoubleType) / lit(100.0))
      .withColumn("bw_hz",
        lit(23828125.0) * ((col("s_suppkey") % 4) + 1).cast(DoubleType))
      .withColumn("tobs_s",
        lit(3600.0) * ((col("s_suppkey") % 5) + 1).cast(DoubleType))
      .withColumn("ds_coherent", radiometerDeltaS(lit(1.05), col("badfrac"),
        col("nstat"), lit(2.0), col("bw_hz"), col("tobs_s")))
      .withColumn("ds_incoherent", radiometerDeltaS(lit(1.05), col("badfrac"),
        sqrt(col("nstat")), lit(2.0), col("bw_hz"), col("tobs_s")))
      .select(col("s_suppkey"), col("nstat"), col("badfrac"), col("bw_hz"),
        col("tobs_s"), col("ds_coherent"), col("ds_incoherent"))
      .orderBy(col("s_suppkey"))

  private val q40Sql =
    s"""WITH t AS (SELECT s_suppkey,
       |    CAST((s_suppkey % 50) + 20 AS DOUBLE) AS nstat,
       |    CAST((s_suppkey * 13) % 30 AS DOUBLE) / 100.0 AS badfrac,
       |    23828125.0 * CAST((s_suppkey % 4) + 1 AS DOUBLE) AS bw_hz,
       |    3600.0 * CAST((s_suppkey % 5) + 1 AS DOUBLE) AS tobs_s
       |  FROM supplier)
       |SELECT s_suppkey, nstat, badfrac, bw_hz, tobs_s,
       |  ${sqlRadiometerDeltaS("1.05", "badfrac", "nstat", "2.0", "bw_hz", "tobs_s")} AS ds_coherent,
       |  ${sqlRadiometerDeltaS("1.05", "badfrac", "sqrt(nstat)", "2.0", "bw_hz", "tobs_s")} AS ds_incoherent
       |FROM t ORDER BY s_suppkey""".stripMargin

  // --- q41: K3/C13 fixed-format TOA (tim) line rendering ----------------
  // All string pieces composed from integers only — no float formatting,
  // so the rendered text is engine-independent (`sp2tim.py:133-187`).

  private def q41(s: SparkSession, d: String): DataFrame = {
    val mjdInt = lit(56000L) + (col("ts_sec") / 86400L).cast(LongType)
    val frac7 = ((col("ts_sec") % 86400L) * 10000000L / 86400L).cast(LongType)
    val psr = concat(lit("B"), lpad((col("user_id") % 2359).cast(StringType), 4, "0"), lit("+54"))
    val errUs = (col("event_id") % 100).cast(StringType)
    Tables.events(s, d)
      .withColumn("toa_str", concat(mjdInt.cast(StringType), lit("."),
        lpad(frac7.cast(StringType), 7, "0")))
      .withColumn("tim_line", concat(
        rpad(psr, 10, " "), lit(" 151.00000 "), col("toa_str"),
        lit(" "), lpad(errUs, 5, " "), lit("  1")))
      .select(col("event_id"), col("toa_str"), col("tim_line"))
      .orderBy(col("event_id"))
  }

  private val q41Sql =
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec FROM events),
      |t AS (SELECT event_id,
      |  concat(CAST(56000 + ts_sec // 86400 AS VARCHAR), '.',
      |         lpad(CAST(((ts_sec % 86400) * 10000000) // 86400 AS VARCHAR), 7, '0')) AS toa_str,
      |  rpad(concat('B', lpad(CAST(user_id % 2359 AS VARCHAR), 4, '0'), '+54'), 10, ' ') AS psr,
      |  lpad(CAST(event_id % 100 AS VARCHAR), 5, ' ') AS err
      |  FROM e)
      |SELECT event_id, toa_str,
      |  concat(psr, ' 151.00000 ', toa_str, ' ', err, '  1') AS tim_line
      |FROM t ORDER BY event_id""".stripMargin

  // --- q42: C12/F1/A17 filename surgery + product filter + size totals --

  private def q42(s: SparkSession, d: String): DataFrame = {
    def z3(c0: Column) = lpad(c0.cast(StringType), 3, "0")
    val fn = concat(lit("L"),
      lpad((col("o_orderkey") % 1000000).cast(StringType), 6, "0"),
      lit("_SAP"), z3(col("o_orderkey") % 3),
      lit("_B"), z3((col("o_orderkey") * 7) % 12),
      lit("_P"), z3((col("o_orderkey") * 11) % 4), lit("_bf.h5"))
    Tables.orders(s, d)
      .withColumn("filename", fn)
      .filter(col("filename").rlike("_SAP00[01]_"))
      .withColumn("obsid", regexp_extract(col("filename"), "^L([0-9]{6})_", 1).cast(LongType))
      .withColumn("tab", regexp_extract(col("filename"), "_B([0-9]{3})_", 1).cast(IntegerType))
      .withColumn("prt", regexp_extract(col("filename"), "_P([0-9]{3})_", 1).cast(IntegerType))
      .groupBy(col("prt"))
      .agg(count(lit(1)).as("n_files"), dsum(col("o_totalprice")).as("total_size"),
        countDistinct(col("obsid")).as("n_obs"), max(col("tab")).as("max_tab"))
      .orderBy(col("prt"))
  }

  private val q42Sql =
    s"""WITH f AS (SELECT o_totalprice,
       |  concat('L', lpad(CAST(o_orderkey % 1000000 AS VARCHAR), 6, '0'),
       |    '_SAP', lpad(CAST(o_orderkey % 3 AS VARCHAR), 3, '0'),
       |    '_B', lpad(CAST((o_orderkey * 7) % 12 AS VARCHAR), 3, '0'),
       |    '_P', lpad(CAST((o_orderkey * 11) % 4 AS VARCHAR), 3, '0'),
       |    '_bf.h5') AS filename
       |  FROM orders),
       |m AS (SELECT o_totalprice,
       |  CAST(regexp_extract(filename, '^L([0-9]{6})_', 1) AS BIGINT) AS obsid,
       |  CAST(regexp_extract(filename, '_B([0-9]{3})_', 1) AS INT) AS tab,
       |  CAST(regexp_extract(filename, '_P([0-9]{3})_', 1) AS INT) AS prt
       |  FROM f WHERE regexp_matches(filename, '_SAP00[01]_'))
       |SELECT prt, COUNT(*) AS n_files, ${sqlDsum("o_totalprice")} AS total_size,
       |  COUNT(DISTINCT obsid) AS n_obs, MAX(tab) AS max_tab
       |FROM m GROUP BY prt ORDER BY prt""".stripMargin

  // --- q43: S10/J7/C6 fixed-width dim parse + grid-bucket Tsky join -----

  private def q43(s: SparkSession, d: String): DataFrame = {
    // dim: one fixed-width row per nation — 5 cells × 5 chars (tenths of K)
    val cells = transform(sequence(lit(0), lit(4)),
      k => (col("n_nationkey") * 37 + k.cast(LongType) * 13) % 3000)
    val fixedRow = Tables.nation(s, d)
      .withColumn("fixed", aggregate(cells, lit(""),
        (acc, v) => concat(acc, lpad(v.cast(StringType), 5, " "))))
    val dim = fixedRow
      .select(col("n_nationkey").cast(IntegerType).as("l"), col("fixed"))
      .crossJoin(broadcast(s.range(5).select(col("id").cast(IntegerType).as("b"))))
      .withColumn("t408",
        trim(expr("substring(fixed, b * 5 + 1, 5)")).cast(LongType).cast(DoubleType) / lit(10.0))
      .select(col("l"), col("b"), col("t408"))
    val fact = Tables.customer(s, d)
      .withColumn("gl", ((col("c_custkey") * 3) % 100).cast(DoubleType))
      .withColumn("l", haslamL(col("gl")))
      .withColumn("b", (col("c_custkey") % 5).cast(IntegerType))
      .withColumn("freq", (lit(120) + col("c_custkey") % 60).cast(DoubleType))
    fact.join(broadcast(dim), Seq("l", "b"))
      .withColumn("tsky", tskyPortable(col("t408"), col("freq")))
      .select(col("c_custkey"), col("l"), col("b"), col("t408"), col("freq"), col("tsky"))
      .orderBy(col("c_custkey"))
  }

  private val q43Sql =
    s"""WITH raw AS (SELECT CAST(n_nationkey AS INT) AS l,
       |  list_reduce(list_prepend('', list_transform(range(0, 5),
       |    k -> lpad(CAST((n_nationkey * 37 + k * 13) % 3000 AS VARCHAR), 5, ' '))),
       |    (acc, x) -> concat(acc, x)) AS fixed
       |  FROM nation),
       |dim AS (SELECT l, CAST(b AS INT) AS b,
       |  CAST(CAST(trim(substring(fixed, CAST(b AS INT) * 5 + 1, 5)) AS BIGINT) AS DOUBLE) / 10.0 AS t408
       |  FROM raw CROSS JOIN (SELECT unnest(range(0, 5)) AS b)),
       |fact AS (SELECT c_custkey,
       |  CAST(((CAST(floor(CAST((c_custkey * 3) % 100 AS DOUBLE) + 0.5) AS INT) % 360) // 4) AS INT) AS l,
       |  CAST(c_custkey % 5 AS INT) AS b,
       |  CAST(120 + c_custkey % 60 AS DOUBLE) AS freq
       |  FROM customer)
       |SELECT c_custkey, fact.l AS l, fact.b AS b, t408, freq,
       |  ${sqlTskyPortable("t408", "freq")} AS tsky
       |FROM fact JOIN dim ON fact.l = dim.l AND fact.b = dim.b
       |ORDER BY c_custkey""".stripMargin

  // --- q44: A8-relational rank-based robust location/scale --------------
  // The order-statistics form of the QQ normalizer: central-50% trimmed
  // mean + IQR-scaled sigma (`fluxcal/lofar_fluxcal.py:200-211` family).

  private def q44(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
    val wn = Window.partitionBy(col("user_id"))
    val ranked = ev
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("k", (col("n") / 4L).cast(LongType)) // n ≥ 4 everywhere
    ranked
      .withColumn("kept", col("rk") > col("k") && col("rk") <= col("n") - col("k"))
      .groupBy(col("user_id"))
      .agg(
        max(col("n")).as("n"),
        (sum(when(col("kept"), d2(col("value")))).cast(DoubleType) /
          sum(when(col("kept"), 1L)).cast(DoubleType)).as("trimmed_mean"),
        max(when(col("rk") === greatest(col("k"), lit(1L)), col("value"))).as("q25"),
        max(when(col("rk") === col("n") - col("k") + 1, col("value"))).as("q75"))
      .withColumn("sigma_iqr", (col("q75") - col("q25")) * lit(0.7413011092528009))
      .select(col("user_id"), col("n"), col("trimmed_mean"), col("q25"),
        col("q75"), col("sigma_iqr"))
      .orderBy(col("user_id"))
  }

  private val q44Sql =
    s"""WITH ranked AS (SELECT user_id, value,
       |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rk,
       |  COUNT(*) OVER (PARTITION BY user_id) AS n
       |  FROM events),
       |k AS (SELECT *, n // 4 AS k,
       |  (rk > n // 4 AND rk <= n - n // 4) AS kept FROM ranked)
       |SELECT user_id, MAX(n) AS n,
       |  CAST(SUM(CASE WHEN kept THEN ${sqlD2("value")} END) AS DOUBLE) /
       |    CAST(SUM(CASE WHEN kept THEN 1 END) AS DOUBLE) AS trimmed_mean,
       |  MAX(CASE WHEN rk = greatest(k, 1) THEN value END) AS q25,
       |  MAX(CASE WHEN rk = n - k + 1 THEN value END) AS q75,
       |  (MAX(CASE WHEN rk = n - k + 1 THEN value END) -
       |   MAX(CASE WHEN rk = greatest(k, 1) THEN value END)) * 0.7413011092528009 AS sigma_iqr
       |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- q45: A10 closed-form degree-2 polynomial baseline ----------------
  // Normal equations solved by Cramer's rule over exact integer/decimal
  // sums — per-chunk model fit without any driver-side collection
  // (`fluxcal/lofar_fluxcal.py:221-231`).

  private def q45(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("chunk", (col("event_id") / 500L).cast(LongType))
      .withColumn("x", (col("event_id") % 500L))
    val g = ev.groupBy(col("chunk")).agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(col("x")).cast(DoubleType).as("sx"),
      sum(col("x") * col("x")).cast(DoubleType).as("sx2"),
      sum(col("x") * col("x") * col("x")).cast(DoubleType).as("sx3"),
      sum(col("x") * col("x") * col("x") * col("x")).cast(DoubleType).as("sx4"),
      sum(d2(col("value"))).cast(DoubleType).as("sy"),
      sum((col("x").cast(DecimalType(18, 0)) * d2(col("value"))).cast(DecimalType(38, 2)))
        .cast(DoubleType).as("sxy"),
      sum(((col("x") * col("x")).cast(DecimalType(18, 0)) * d2(col("value"))).cast(DecimalType(38, 2)))
        .cast(DoubleType).as("sx2y"))
    val det = col("n") * (col("sx2") * col("sx4") - col("sx3") * col("sx3")) -
      col("sx") * (col("sx") * col("sx4") - col("sx2") * col("sx3")) +
      col("sx2") * (col("sx") * col("sx3") - col("sx2") * col("sx2"))
    val c0 = (col("sy") * (col("sx2") * col("sx4") - col("sx3") * col("sx3")) -
      col("sx") * (col("sxy") * col("sx4") - col("sx2y") * col("sx3")) +
      col("sx2") * (col("sxy") * col("sx3") - col("sx2y") * col("sx2"))) / det
    val c1 = (col("n") * (col("sxy") * col("sx4") - col("sx2y") * col("sx3")) -
      col("sy") * (col("sx") * col("sx4") - col("sx2") * col("sx3")) +
      col("sx2") * (col("sx") * col("sx2y") - col("sx2") * col("sxy"))) / det
    val c2 = (col("n") * (col("sx2") * col("sx2y") - col("sx3") * col("sxy")) -
      col("sx") * (col("sx") * col("sx2y") - col("sx2") * col("sxy")) +
      col("sy") * (col("sx") * col("sx3") - col("sx2") * col("sx2"))) / det
    g.select(col("chunk"), col("n").cast(LongType).as("n"),
        c0.as("c0"), c1.as("c1"), c2.as("c2"))
      .orderBy(col("chunk"))
  }

  private val q45Sql =
    s"""WITH e AS (SELECT event_id // 500 AS chunk, event_id % 500 AS x, value FROM events),
       |g AS (SELECT chunk,
       |  CAST(COUNT(*) AS DOUBLE) AS n,
       |  CAST(SUM(x) AS DOUBLE) AS sx,
       |  CAST(SUM(x * x) AS DOUBLE) AS sx2,
       |  CAST(SUM(x * x * x) AS DOUBLE) AS sx3,
       |  CAST(SUM(x * x * x * x) AS DOUBLE) AS sx4,
       |  CAST(SUM(${sqlD2("value")}) AS DOUBLE) AS sy,
       |  CAST(SUM(CAST(CAST(x AS DECIMAL(18,0)) * ${sqlD2("value")} AS DECIMAL(38,2))) AS DOUBLE) AS sxy,
       |  CAST(SUM(CAST(CAST(x * x AS DECIMAL(18,0)) * ${sqlD2("value")} AS DECIMAL(38,2))) AS DOUBLE) AS sx2y
       |  FROM e GROUP BY chunk)
       |SELECT chunk, CAST(n AS BIGINT) AS n,
       |  (sy * (sx2 * sx4 - sx3 * sx3) - sx * (sxy * sx4 - sx2y * sx3) + sx2 * (sxy * sx3 - sx2y * sx2)) /
       |  (n * (sx2 * sx4 - sx3 * sx3) - sx * (sx * sx4 - sx2 * sx3) + sx2 * (sx * sx3 - sx2 * sx2)) AS c0,
       |  (n * (sxy * sx4 - sx2y * sx3) - sy * (sx * sx4 - sx2 * sx3) + sx2 * (sx * sx2y - sx2 * sxy)) /
       |  (n * (sx2 * sx4 - sx3 * sx3) - sx * (sx * sx4 - sx2 * sx3) + sx2 * (sx * sx3 - sx2 * sx2)) AS c1,
       |  (n * (sx2 * sx2y - sx3 * sxy) - sx * (sx * sx2y - sx2 * sxy) + sy * (sx * sx3 - sx2 * sx2)) /
       |  (n * (sx2 * sx4 - sx3 * sx3) - sx * (sx * sx4 - sx2 * sx3) + sx2 * (sx * sx3 - sx2 * sx2)) AS c2
       |FROM g ORDER BY chunk""".stripMargin

  // --- q46: A22 exact-integer 2-D autocorrelation -----------------------
  // Dynamic spectrum cells in integer cents → lag self-join → exact
  // BIGINT products (`dynsp.py:232-251,316-336`). The lag join shuffles
  // only the 384-cell aggregate, never the raw events.

  private def q46(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .withColumn("t", ((col("ts_sec") / 3600L).cast(LongType) % 24).cast(IntegerType))
      .withColumn("c", (col("user_id") % 16).cast(IntegerType))
      .groupBy(col("t"), col("c"))
      .agg(sum((d2(col("value")) * 100).cast(LongType)).as("cents"))
    val lagGrid = s.range(5).select((col("id") - 2).cast(IntegerType).as("dt"))
      .crossJoin(s.range(5).select((col("id") - 2).cast(IntegerType).as("dc")))
    val b = cells.select(col("t").as("tb"), col("c").as("cb"), col("cents").as("cents_b"))
    cells.crossJoin(broadcast(lagGrid))
      .join(b, col("tb") === col("t") + col("dt") && col("cb") === col("c") + col("dc"))
      .groupBy(col("dt"), col("dc"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("cents") * col("cents_b")).cast(DoubleType) / lit(10000.0)).as("acf"))
      .orderBy(col("dt"), col("dc"))
  }

  private val q46Sql =
    s"""WITH cells AS (
       |  SELECT CAST(((epoch_ns(ts) // 1000000000) // 3600) % 24 AS INT) AS t,
       |    CAST(user_id % 16 AS INT) AS c,
       |    SUM(CAST(${sqlD2("value")} * 100 AS BIGINT)) AS cents
       |  FROM events GROUP BY 1, 2),
       |lags AS (SELECT CAST(dt AS INT) AS dt, CAST(dc AS INT) AS dc
       |  FROM (SELECT unnest(range(-2, 3)) AS dt), (SELECT unnest(range(-2, 3)) AS dc))
       |SELECT dt, dc, COUNT(*) AS n_pairs,
       |  CAST(SUM(a.cents * b.cents) AS DOUBLE) / 10000.0 AS acf
       |FROM cells a CROSS JOIN lags JOIN cells b
       |  ON b.t = a.t + dt AND b.c = a.c + dc
       |GROUP BY dt, dc ORDER BY dt, dc""".stripMargin

  // --- q47: A5 profile statistics block ---------------------------------
  // Peak, argmax, effective width, duty cycle over the daily revenue
  // "profile" per return flag (`fluxcal/lofar_fluxcal.py:867-886`).

  private def q47(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("rf"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(d2(col("l_extendedprice"))).as("rev"))
    val w = Window.partitionBy(col("rf")).orderBy(col("rev").desc, col("day"))
    daily
      .withColumn("rk", row_number().over(w))
      .groupBy(col("rf"))
      .agg(
        count(lit(1)).as("n_days"),
        max(col("rev")).cast(DoubleType).as("peak"),
        sum(col("rev")).cast(DoubleType).as("total"),
        max(when(col("rk") === 1, col("day"))).as("peak_day"))
      .withColumn("weff", col("total") / col("peak"))
      .withColumn("duty_cycle", col("weff") / col("n_days").cast(DoubleType))
      .select(col("rf"), col("n_days"), col("peak"), col("total"),
        col("peak_day"), col("weff"), col("duty_cycle"))
      .orderBy(col("rf"))
  }

  private val q47Sql =
    s"""WITH daily AS (
       |  SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE) AS day,
       |    SUM(${sqlD2("l_extendedprice")}) AS rev
       |  FROM lineitem GROUP BY 1, 2),
       |ranked AS (SELECT rf, day, rev,
       |  ROW_NUMBER() OVER (PARTITION BY rf ORDER BY rev DESC, day) AS rk FROM daily)
       |SELECT rf, COUNT(*) AS n_days,
       |  CAST(MAX(rev) AS DOUBLE) AS peak,
       |  CAST(SUM(rev) AS DOUBLE) AS total,
       |  MAX(CASE WHEN rk = 1 THEN day END) AS peak_day,
       |  CAST(SUM(rev) AS DOUBLE) / CAST(MAX(rev) AS DOUBLE) AS weff,
       |  CAST(SUM(rev) AS DOUBLE) / CAST(MAX(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS duty_cycle
       |FROM ranked GROUP BY rf ORDER BY rf""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q36_sexagesimal", q36, Some(q36Sql), Seq("C1", "C13")),
    GQuery("q37_tinst_range_avg", q37, Some(q37Sql), Seq("C7")),
    GQuery("q38_dispersion", q38, Some(q38Sql), Seq("C10", "F11")),
    GQuery("q39_pulsar_physics", q39, Some(q39Sql), Seq("C11")),
    GQuery("q40_radiometer", q40, Some(q40Sql), Seq("C9")),
    GQuery("q41_tim_lines", q41, Some(q41Sql), Seq("K3", "C13")),
    GQuery("q42_filename_surgery", q42, Some(q42Sql), Seq("C12", "F1", "A17")),
    GQuery("q43_haslam_tsky", q43, Some(q43Sql), Seq("S10", "J7", "C6")),
    GQuery("q44_robust_trimmed", q44, Some(q44Sql), Seq("A8", "A12", "O3")),
    GQuery("q45_polybaseline", q45, Some(q45Sql), Seq("A10")),
    GQuery("q46_acf2d", q46, Some(q46Sql), Seq("A22")),
    GQuery("q47_profile_stats", q47, Some(q47Sql), Seq("A5", "A6")))
}
