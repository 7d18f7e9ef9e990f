package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.AsOfJoin
import QueryDsl._

/** Event-stream analytics over the `events` table — sessionization, phase
  * folding, as-of joins, tumbling windows, interval disjointness, nearest
  * lookups, interpolation. Reference: `pulsestack.py:583-643` (fold),
  * `tiles/.../getState.py:275-301` (as-of), `scheduling/bfscheduler.py:
  * 398-454` (interval overlap), `fluxcal/lofar_gain.py:84-128` (interp).
  */
object TimeSeriesQ {

  /** W1-temporal sessionization: per-user 30-min-gap sessions. */
  private def q20(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val ws = w.rowsBetween(Window.unboundedPreceding, 0)
    ev
      .withColumn("gap", when(col("ts_sec") - lag(col("ts_sec"), 1).over(w) <= 1800, 0).otherwise(1))
      .withColumn("session", sum(col("gap")).over(ws))
      .groupBy(col("user_id"), col("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_sec")).as("start_sec"), max(col("ts_sec")).as("end_sec"),
        dsum(col("value")).as("session_value"))
      .select(col("user_id"), col("session"), col("n_events"),
        col("start_sec"), col("end_sec"), col("session_value"))
      .orderBy(col("user_id"), col("session"))
  }

  private val q20Sql =
    s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, epoch_ns(ts) // 1000000000 AS ts_sec, value FROM events),
       |flagged AS (SELECT *,
       |  CASE WHEN ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) <= 1800 THEN 0 ELSE 1 END AS gap
       |  FROM e),
       |sess AS (SELECT *, SUM(gap) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session FROM flagged)
       |SELECT user_id, CAST(session AS BIGINT) AS session, COUNT(*) AS n_events,
       |  MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec,
       |  ${sqlDsum("value")} AS session_value
       |FROM sess GROUP BY user_id, session ORDER BY user_id, session""".stripMargin

  /** A2 phase folding: epoch-second phase against a 3600 s period into 64
    * bins, integer-exact (`pulsestack.py:583-620`). */
  private def q21(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("ibin", (pmod(col("ts_sec"), lit(3600L)) * 64L / 3600L).cast(LongType))
      .groupBy(col("ibin"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("folded_value"),
        davg(col("value")).as("folded_mean"))
      .orderBy(col("ibin"))

  private val q21Sql =
    s"""SELECT ((epoch_ns(ts) // 1000000000) % 3600) * 64 // 3600 AS ibin,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS folded_value, ${sqlDavg("value")} AS folded_mean
       |FROM events GROUP BY 1 ORDER BY ibin""".stripMargin

  /** J3/J5 as-of join via the distributed union+window operator: for each
    * purchase, the user's most recent preceding error event. */
  private def q22(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("ts_sec"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ns").as("err_ts_ns"),
        col("event_id").as("err_event_id"))
    AsOfJoin(purchases, errors, Seq("user_id"), "ts_ns", "err_ts_ns",
      payload = Seq("err_event_id"), strict = false,
      tiebreak = Some(("event_id", "err_event_id")))
      .select(col("user_id"), col("event_id"), col("ts_sec"), col("err_event_id"))
      .orderBy(col("event_id"))
  }

  private val q22Sql =
    """WITH u AS (
      |  SELECT user_id, epoch_ns(ts) AS t, 1 AS side, event_id, event_id AS tb, NULL::BIGINT AS err_id,
      |         epoch_ns(ts) // 1000000000 AS ts_sec
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, epoch_ns(ts) AS t, 0 AS side, NULL, event_id AS tb, event_id,
      |         NULL
      |  FROM events WHERE event_type = 'error'),
      |f AS (SELECT user_id, side, event_id, ts_sec,
      |  last_value(err_id IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, side, tb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_event_id
      |  FROM u)
      |SELECT user_id, event_id, ts_sec, err_event_id FROM f WHERE side = 1
      |ORDER BY event_id""".stripMargin

  /** ST2-batch tumbling window: hourly per-type aggregation
    * (`pulsestack.py:594-607`). */
  private def q23(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour", (col("ts_sec") / 3600L).cast(LongType))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"),
        davg(col("value")).as("mean_value"))
      .orderBy(col("hour"), col("event_type"))

  private val q23Sql =
    s"""SELECT (epoch_ns(ts) // 1000000000) // 3600 AS hour, event_type,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS total, ${sqlDavg("value")} AS mean_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** J10/U4 interval disjointness: purchases whose 5-minute scan window
    * contains none of the same user's error minutes
    * (`scheduling/bfscheduler.py:398-454`). */
  private def q24(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("minute", (col("ts_sec") / 60L).cast(LongType))
      .select(col("event_id"), col("user_id"), col("minute"))
    val errors = ev.filter(col("event_type") === "error")
      .withColumn("err_minute", (col("ts_sec") / 60L).cast(LongType))
      .select(col("user_id").as("err_user"), col("err_minute"))
    purchases.join(errors,
        purchases("user_id") === errors("err_user") &&
          errors("err_minute") >= purchases("minute") &&
          errors("err_minute") <= purchases("minute") + 4,
        "left_anti")
      .orderBy(col("event_id"))
  }

  private val q24Sql =
    """WITH p AS (SELECT event_id, user_id, (epoch_ns(ts) // 1000000000) // 60 AS minute
      |           FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT user_id, (epoch_ns(ts) // 1000000000) // 60 AS minute
      |      FROM events WHERE event_type = 'error')
      |SELECT p.event_id AS event_id, p.user_id AS user_id, p.minute AS minute FROM p
      |WHERE NOT EXISTS (SELECT 1 FROM e
      |  WHERE e.user_id = p.user_id AND e.minute BETWEEN p.minute AND p.minute + 4)
      |ORDER BY event_id""".stripMargin

  /** J4/O1 nearest-key lookup against a small broadcast dimension
    * (`fluxcal/lofar_gain_hamaker_carozzi.py:134-136`). */
  private def q25(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val sup = Tables.supplier(s, d)
    // nearest = argmin over the broadcast dim: min(struct(dist, key))
    // gets map-side partial aggregation — no 20M-row window shuffle
    // (same (dist, s_suppkey) lexicographic tie-break as a rank-1 window)
    val joined = p.crossJoin(broadcast(sup))
      .withColumn("target", col("p_retailprice") / 50.0)
      .withColumn("dist", abs(col("s_acctbal") - col("target")))
    joined
      .groupBy(col("p_partkey"))
      .agg(min(struct(col("dist"), col("s_suppkey"))).as("m"))
      .select(col("p_partkey"), col("m.s_suppkey").as("s_suppkey"),
        col("m.dist").as("dist"))
      .orderBy(col("p_partkey"))
  }

  private val q25Sql =
    """SELECT p_partkey, s_suppkey, dist FROM (
      |  SELECT p_partkey, s_suppkey, abs(s_acctbal - p_retailprice / 50.0) AS dist,
      |    ROW_NUMBER() OVER (PARTITION BY p_partkey
      |      ORDER BY abs(s_acctbal - p_retailprice / 50.0), s_suppkey) AS rn
      |  FROM part CROSS JOIN supplier) t
      |WHERE rn = 1 ORDER BY p_partkey""".stripMargin

  /** J8 1-D linear interpolation on a derived grid: expected revenue at a
    * continuous quantity coordinate (`fluxcal/lofar_gain.py:84-128`). */
  private def q26(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val grid = li.groupBy(col("l_quantity").cast(IntegerType).as("q"))
      .agg(davg(col("l_extendedprice")).as("g"))
    val ev = Tables.events(s, d)
      .withColumn("x", least(greatest(col("value") / 4.0, lit(1.0)), lit(49.0)))
      .withColumn("x0", floor(col("x")).cast(IntegerType))
    val g0 = grid.select(col("q").as("q0"), col("g").as("g0"))
    val g1 = grid.select(col("q").as("q1"), col("g").as("g1"))
    ev.join(broadcast(g0), ev("x0") === g0("q0"))
      .join(broadcast(g1), ev("x0") + 1 === g1("q1"))
      .withColumn("y", col("g0") + (col("g1") - col("g0")) * (col("x") - col("x0")))
      .select(col("event_id"), col("x"), col("y"))
      .orderBy(col("event_id"))
  }

  private val q26Sql =
    s"""WITH grid AS (
       |  SELECT CAST(l_quantity AS INT) AS q, ${sqlDavg("l_extendedprice")} AS g
       |  FROM lineitem GROUP BY 1),
       |e AS (SELECT event_id, least(greatest(value / 4.0, 1.0), 49.0) AS x FROM events)
       |SELECT event_id, x, g0.g + (g1.g - g0.g) * (x - CAST(floor(x) AS INT)) AS y
       |FROM e JOIN grid g0 ON CAST(floor(x) AS INT) = g0.q
       |       JOIN grid g1 ON CAST(floor(x) AS INT) + 1 = g1.q
       |ORDER BY event_id""".stripMargin

  /** J8 2-D bilinear interpolation on a regular (freq, el) gain grid via
    * `GridInterp.bilinear` — the reference's nested np.interp order
    * (`fluxcal/lofar_gain.py:84-128`). The grid here is a deterministic
    * synthetic cube (the real one is ingested by `GainCube`); the oracle
    * mirrors the 4-corner join + weight algebra exactly. */
  private def q64(s: SparkSession, d: String): DataFrame = {
    val grid = s.range(29L * 91L)
      .withColumn("fi", expr("id div 91"))
      .withColumn("ei", expr("id % 91"))
      .select(
        (lit(110.0) + lit(5.0) * col("fi")).as("freq"),
        col("ei").cast(DoubleType).as("el"),
        (lit(1.0) + col("ei") * 0.25 + col("fi") * 3.5 +
          ((col("id") * 37) % 101).cast(DoubleType) * 0.01).as("v"))
    val probes = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 37 === 0 && col("l_linenumber") === 1)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"),
        (lit(110.0) + (col("l_partkey") % 1400).cast(DoubleType) / 10.0).as("freq"),
        ((col("l_orderkey") % 9001).cast(DoubleType) / 100.0).as("el"))
    graft.operators.GridInterp.bilinear(probes, grid, "freq", "el", "aeff")
      .select(col("okey"), col("pkey"), col("freq"), col("el"), col("aeff"))
      .orderBy(col("okey"))
  }

  private val q64Sql =
    """WITH grid AS (
      |  SELECT CAST(i // 91 AS INT) AS fi, CAST(i % 91 AS INT) AS ei,
      |    1.0 + (i % 91) * 0.25 + (i // 91) * 3.5 + CAST((i * 37) % 101 AS DOUBLE) * 0.01 AS v
      |  FROM range(0, 2639) t(i)),
      |p AS (SELECT l_orderkey AS okey, l_partkey AS pkey,
      |    110.0 + CAST(l_partkey % 1400 AS DOUBLE) / 10.0 AS freq,
      |    CAST(l_orderkey % 9001 AS DOUBLE) / 100.0 AS el
      |  FROM lineitem WHERE l_orderkey % 37 = 0 AND l_linenumber = 1),
      |idx AS (SELECT *,
      |    least(greatest(CAST(floor((freq - 110.0) / 5.0) AS INT), 0), 28) AS fi0,
      |    least(least(greatest(CAST(floor((freq - 110.0) / 5.0) AS INT), 0), 28) + 1, 28) AS fi1,
      |    least(greatest(CAST(floor(el) AS INT), 0), 90) AS ei0,
      |    least(least(greatest(CAST(floor(el) AS INT), 0), 90) + 1, 90) AS ei1
      |  FROM p),
      |joined AS (SELECT idx.*,
      |    110.0 + 5.0 * fi0 AS f0, 110.0 + 5.0 * fi1 AS f1,
      |    g00.v AS g00, g10.v AS g10, g01.v AS g01, g11.v AS g11
      |  FROM idx
      |    JOIN grid g00 ON fi0 = g00.fi AND ei0 = g00.ei
      |    JOIN grid g10 ON fi1 = g10.fi AND ei0 = g10.ei
      |    JOIN grid g01 ON fi0 = g01.fi AND ei1 = g01.ei
      |    JOIN grid g11 ON fi1 = g11.fi AND ei1 = g11.ei),
      |w AS (SELECT *,
      |    CASE WHEN f1 > f0 THEN least(greatest((freq - f0) / (f1 - f0), 0.0), 1.0) ELSE 0.0 END AS wf,
      |    CASE WHEN ei1 > ei0 THEN least(greatest((el - ei0) / (ei1 - ei0), 0.0), 1.0) ELSE 0.0 END AS we
      |  FROM joined),
      |lohi AS (SELECT *, g00 + wf * (g10 - g00) AS lo, g01 + wf * (g11 - g01) AS hi FROM w)
      |SELECT okey, pkey, freq, el, lo + we * (hi - lo) AS aeff
      |FROM lohi ORDER BY okey""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q20_sessionize", q20, Some(q20Sql), Seq("W1", "ST2")),
    GQuery("q21_phase_fold", q21, Some(q21Sql), Seq("A2", "R1")),
    GQuery("q22_asof_join", q22, Some(q22Sql), Seq("J3", "J5", "C14")),
    GQuery("q23_tumbling_hour", q23, Some(q23Sql), Seq("ST2", "A1")),
    GQuery("q24_interval_disjoint", q24, Some(q24Sql), Seq("J10", "U4")),
    GQuery("q25_nearest_key", q25, Some(q25Sql), Seq("J4", "O1")),
    GQuery("q26_interp_grid", q26, Some(q26Sql), Seq("J8", "J7")),
    GQuery("q64_bilinear_gain", q64, Some(q64Sql), Seq("J8", "S11", "J6")))
}
