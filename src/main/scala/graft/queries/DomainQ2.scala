package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import QueryDsl._

/** Second domain battery: hardware bookkeeping, scheduling analytics,
  * polyco phase evaluation, and the two-pass bad-chunk mask.
  */
object DomainQ2 {

  // --- q48: F10/A15/J9 station-class flagged-tile accounting ------------
  // Station class from the name prefix (CS/RS/intl → 24/48/96 elements,
  // `fluxcal/get_flagged_tiles.py:108-130`), per-class totals, worst
  // station with deterministic tie-break.

  private def q48(s: SparkSession, d: String): DataFrame = {
    val st = Tables.supplier(s, d)
      .withColumn("prefix",
        when(col("s_suppkey") % 3 === 0, "CS")
          .when(col("s_suppkey") % 3 === 1, "RS").otherwise("DE"))
      .withColumn("station",
        concat(col("prefix"), lpad((col("s_suppkey") % 1000).cast(StringType), 3, "0")))
      .withColumn("nelem",
        when(col("prefix") === "CS", 24)
          .when(col("prefix") === "RS", 48).otherwise(96))
      .withColumn("nflag", (col("s_suppkey") * 7) % 12)
    val w = Window.partitionBy(col("prefix"))
      .orderBy(col("nflag").desc, col("station"))
    st.withColumn("rk", row_number().over(w))
      .groupBy(col("prefix"))
      .agg(
        count(lit(1)).as("n_stations"),
        sum(col("nflag")).as("total_flagged"),
        sum(col("nelem")).as("capacity"),
        (sum(col("nflag")).cast(DoubleType) / sum(col("nelem")).cast(DoubleType))
          .as("flag_frac"),
        max(when(col("rk") === 1, col("station"))).as("worst_station"),
        max(when(col("rk") === 1, col("nflag"))).as("worst_n"))
      .orderBy(col("prefix"))
  }

  private val q48Sql =
    """WITH st AS (SELECT
      |    CASE WHEN s_suppkey % 3 = 0 THEN 'CS' WHEN s_suppkey % 3 = 1 THEN 'RS' ELSE 'DE' END AS prefix,
      |    s_suppkey FROM supplier),
      |named AS (SELECT prefix,
      |    concat(prefix, lpad(CAST(s_suppkey % 1000 AS VARCHAR), 3, '0')) AS station,
      |    CASE prefix WHEN 'CS' THEN 24 WHEN 'RS' THEN 48 ELSE 96 END AS nelem,
      |    (s_suppkey * 7) % 12 AS nflag
      |  FROM st),
      |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY prefix ORDER BY nflag DESC, station) AS rk FROM named)
      |SELECT prefix, COUNT(*) AS n_stations, CAST(SUM(nflag) AS BIGINT) AS total_flagged,
      |  CAST(SUM(nelem) AS BIGINT) AS capacity,
      |  CAST(SUM(nflag) AS DOUBLE) / CAST(SUM(nelem) AS DOUBLE) AS flag_frac,
      |  MAX(CASE WHEN rk = 1 THEN station END) AS worst_station,
      |  MAX(CASE WHEN rk = 1 THEN nflag END) AS worst_n
      |FROM ranked GROUP BY prefix ORDER BY prefix""".stripMargin

  // --- q49: A24/W5/O4 scheduler visibility scoring + ranking ------------
  // Transit-proximity + elevation + in-slot bonus + priority override
  // (`scheduling/bfscheduler.py:279-324`); greedy placement itself stays
  // driver-side over the tiny ranked result (order-dependent by design).

  private def q49(s: SparkSession, d: String): DataFrame = {
    import graft.functions.AstroFunctions._
    val lat = 52.915111 // LOFAR site, azlst.pl defaults
    val lon = 6.869883
    val startMjd = 56000.0
    // transit_hour is now COMPUTED from (RA, LST) via the C4 transit pack —
    // hours from slot start to the next transit — not synthesized.
    val t = Tables.customer(s, d)
      .withColumn("dec_deg", ((col("c_custkey") * 7) % 120).cast(DoubleType) - 30.0)
      .withColumn("ra_deg", ((col("c_custkey") * 7919) % 360).cast(DoubleType))
      .withColumn("transit_hour",
        (nextTransitMjd(lit(startMjd), col("ra_deg"), lit(lon)) - lit(startMjd)) * 24.0)
      .withColumn("max_el", transitElevation(col("dec_deg"), lit(lat)))
      .withColumn("transit_score",
        lit(12.0) - abs(col("transit_hour") - 12.0))
      .withColumn("score",
        lit(90.0) / col("max_el") + col("transit_score") +
          when(col("transit_hour") >= 2 && col("transit_hour") <= 6, 10.0)
            .otherwise(0.0) +
          when(col("c_custkey") % 100 === 0, 100.0).otherwise(0.0))
    // Distributed top-k FIRST (TakeOrderedAndProject: per-partition partial
    // top-50, driver merge), THEN a ranking window over exactly 50 rows —
    // never a partition-less row_number over the full target table.
    val top = t.orderBy(col("score").desc, col("c_custkey")).limit(50)
    val w = Window.orderBy(col("score").desc, col("c_custkey"))
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("c_custkey"), col("dec_deg"),
        col("transit_hour"), col("max_el"), col("score"))
      .orderBy(col("rank"))
  }

  private val q49Sql = {
    import graft.functions.AstroFunctions._
    val nextT = sqlNextTransitMjd("56000.0", "ra_deg", "6.869883")
    val maxEl = sqlTransitElevation("dec_deg", "52.915111")
    s"""WITH t AS (SELECT c_custkey,
       |    CAST((c_custkey * 7) % 120 AS DOUBLE) - 30.0 AS dec_deg,
       |    CAST((c_custkey * 7919) % 360 AS DOUBLE) AS ra_deg
       |  FROM customer),
       |tr AS (SELECT c_custkey, dec_deg,
       |    ($nextT - 56000.0) * 24.0 AS transit_hour
       |  FROM t),
       |scored AS (SELECT c_custkey, dec_deg, transit_hour,
       |    $maxEl AS max_el,
       |    90.0 / $maxEl + (12.0 - abs(transit_hour - 12.0))
       |      + CASE WHEN transit_hour >= 2 AND transit_hour <= 6 THEN 10.0 ELSE 0.0 END
       |      + CASE WHEN c_custkey % 100 = 0 THEN 100.0 ELSE 0.0 END AS score
       |  FROM tr),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, c_custkey) AS rank FROM scored)
       |SELECT rank, c_custkey, dec_deg, transit_hour, max_el, score
       |FROM ranked WHERE rank <= 50 ORDER BY rank""".stripMargin
  }

  // --- q50: C14 polyco phase evaluation via segment range join ----------
  // Polyco segments as a broadcast dimension; each event lands in exactly
  // one MJD span; phase = Horner over (t − tmid) (`pulsestack.py:43-44`,
  // `sp2tim.py:129-131`).

  private def q50(s: SparkSession, d: String): DataFrame = {
    val segs = Tables.nation(s, d)
      .select(col("n_nationkey").cast(DoubleType).as("i"))
      .withColumn("tmid", lit(56000.0) + col("i") * 0.5)
      .withColumn("rphase", ((col("i") * 37) % 1000))
      .withColumn("f0_hz", lit(1.0) + col("i") * 0.001)
      .withColumn("c2", col("i") % 5 * 1.0e-9)
      .select(col("tmid"), col("rphase"), col("f0_hz"), col("c2"))
    val ev = Tables.events(s, d)
      .withColumn("mjd",
        lit(56000.0) + (col("ts_sec") % 1036800L).cast(DoubleType) / 86400.0)
    ev.join(broadcast(segs),
        ev("mjd") >= segs("tmid") - 0.25 && ev("mjd") < segs("tmid") + 0.25)
      .withColumn("dt_sec", (col("mjd") - col("tmid")) * 86400.0)
      .withColumn("phase",
        (col("c2") * col("dt_sec") + col("f0_hz")) * col("dt_sec") + col("rphase"))
      .withColumn("pulse_n", floor(col("phase")).cast(LongType))
      .withColumn("phase_frac", col("phase") - floor(col("phase")))
      .select(col("event_id"), col("mjd"), col("tmid"), col("phase"),
        col("pulse_n"), col("phase_frac"))
      .orderBy(col("event_id"))
  }

  private val q50Sql =
    """WITH segs AS (SELECT
      |    56000.0 + CAST(n_nationkey AS DOUBLE) * 0.5 AS tmid,
      |    (CAST(n_nationkey AS DOUBLE) * 37) % 1000 AS rphase,
      |    1.0 + CAST(n_nationkey AS DOUBLE) * 0.001 AS f0_hz,
      |    CAST(n_nationkey AS DOUBLE) % 5 * 1.0e-9 AS c2
      |  FROM nation),
      |ev AS (SELECT event_id,
      |    56000.0 + CAST((epoch_ns(ts) // 1000000000) % 1036800 AS DOUBLE) / 86400.0 AS mjd
      |  FROM events),
      |j AS (SELECT event_id, mjd, tmid,
      |    (mjd - tmid) * 86400.0 AS dt_sec, rphase, f0_hz, c2
      |  FROM ev JOIN segs ON mjd >= tmid - 0.25 AND mjd < tmid + 0.25),
      |p AS (SELECT event_id, mjd, tmid,
      |    (c2 * dt_sec + f0_hz) * dt_sec + rphase AS phase FROM j)
      |SELECT event_id, mjd, tmid, phase,
      |  CAST(floor(phase) AS BIGINT) AS pulse_n,
      |  phase - floor(phase) AS phase_frac
      |FROM p ORDER BY event_id""".stripMargin

  // --- q51: A13 two-pass bad-chunk masking ------------------------------
  // Per-chunk std → sorted-gap locut/hicut (max diff in lower/upper half,
  // `pulsestack.py:79-91`) → outlier chunks replaced by the global
  // (lower-)median std.

  private def q51(s: SparkSession, d: String): DataFrame = {
    val chunks = Tables.events(s, d)
      .withColumn("chunk", floor(col("event_id") / 100L))
      .groupBy(col("chunk"))
      .agg(sqrt(dvarPop(col("value"))).as("std"))
    val w = Window.orderBy(col("std"), col("chunk"))
    val ranked = chunks
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("diff", col("std") - lag(col("std"), 1).over(w))
    // cut thresholds: the std just above the largest gap within each half
    val cuts = ranked.filter(col("diff").isNotNull)
      .withColumn("half", when(col("rk") <= (col("n") / 2L).cast(LongType), "lo").otherwise("hi"))
      .withColumn("hrk", row_number().over(
        Window.partitionBy(col("half")).orderBy(col("diff").desc, col("rk"))))
      .filter(col("hrk") === 1)
      .groupBy()
      .agg(
        max(when(col("half") === "lo", col("std"))).as("locut"),
        max(when(col("half") === "hi", col("std"))).as("hicut"))
    val median = ranked
      .filter(col("rk") === ((col("n") + 1) / 2L).cast(LongType))
      .select(col("std").as("median_std"))
    ranked.crossJoin(broadcast(cuts)).crossJoin(broadcast(median))
      .withColumn("masked",
        (col("locut").isNotNull && col("std") < col("locut")) ||
          (col("hicut").isNotNull && col("std") >= col("hicut")))
      .withColumn("replacement",
        when(col("masked"), col("median_std")).otherwise(col("std")))
      .select(col("chunk"), col("std"), col("rk"), col("masked"),
        col("replacement"))
      .orderBy(col("chunk"))
  }

  private val q51Sql =
    s"""WITH chunks AS (
       |  SELECT event_id // 100 AS chunk, sqrt(${sqlDvarPop("value")}) AS std
       |  FROM events GROUP BY 1),
       |ranked AS (SELECT chunk, std,
       |  ROW_NUMBER() OVER (ORDER BY std, chunk) AS rk,
       |  COUNT(*) OVER () AS n,
       |  std - lag(std) OVER (ORDER BY std, chunk) AS diff
       |  FROM chunks),
       |halves AS (SELECT *, CASE WHEN rk <= n // 2 THEN 'lo' ELSE 'hi' END AS half
       |  FROM ranked WHERE diff IS NOT NULL),
       |cuts AS (SELECT
       |    MAX(CASE WHEN half = 'lo' AND hrk = 1 THEN std END) AS locut,
       |    MAX(CASE WHEN half = 'hi' AND hrk = 1 THEN std END) AS hicut
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY half ORDER BY diff DESC, rk) AS hrk FROM halves)),
       |med AS (SELECT std AS median_std FROM ranked WHERE rk = (n + 1) // 2)
       |SELECT chunk, std, rk,
       |  ((locut IS NOT NULL AND std < locut) OR (hicut IS NOT NULL AND std >= hicut)) AS masked,
       |  CASE WHEN (locut IS NOT NULL AND std < locut) OR (hicut IS NOT NULL AND std >= hicut)
       |       THEN median_std ELSE std END AS replacement
       |FROM ranked CROSS JOIN cuts CROSS JOIN med ORDER BY chunk""".stripMargin

  // --- q52: R1 circular rotation as a stateless re-key ------------------
  // Profile cube synthesized from lineitem, rotated by the REAL
  // `ProfileOps.rotate` operator (not a re-derivation) BEFORE the
  // aggregation — the re-key costs nothing extra because the groupBy
  // shuffle keys on the rotated bin directly (`fluxcal/snr.py:36-46`).

  private def q52(s: SparkSession, d: String): DataFrame = {
    val samples = Tables.lineitem(s, d)
      .withColumn("chan", (col("l_suppkey") % 8).cast(IntegerType))
      .withColumn("bin", (col("l_partkey") % 64).cast(IntegerType))
    val rotated = graft.operators.ProfileOps
      .rotate(graft.operators.Cube(samples, samples), shiftBins = 17, nbins = 64)
    rotated.samples
      .groupBy(col("chan"), col("bin"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("value"))
      .orderBy(col("chan"), col("bin"))
  }

  private val q52Sql =
    s"""SELECT CAST(l_suppkey % 8 AS INT) AS chan,
       |  CAST(((l_partkey % 64 + 17) % 64 + 64) % 64 AS INT) AS bin,
       |  COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS value
       |FROM lineitem GROUP BY 1, 2 ORDER BY chan, bin""".stripMargin

  // --- q53: R2 incoherent dedispersion as a per-channel re-key ----------
  // Driven by the REAL `ProfileOps.dedisperse` operator: shift =
  // round(delay_sec/tbin) from the `dide`/`tau` delay formula; the
  // dedispersed total profile is one aggregation over the re-keyed
  // bin — zero extra shuffle vs the undedispersed fold. The oracle
  // replays the operator's exact expression tree (same division chain,
  // same round) so the compare stays bitwise.

  private def q53(s: SparkSession, d: String): DataFrame = {
    val samples = Tables.lineitem(s, d)
      .withColumn("chan", (col("l_suppkey") % 8).cast(IntegerType))
      .withColumn("bin", (col("l_partkey") % 64).cast(IntegerType))
    val dedispersed = graft.operators.ProfileOps.dedisperse(
      graft.operators.Cube(samples, samples),
      dm = 30.0, f0Mhz = 110.0, chanBwMhz = 5.0, fRefMhz = 150.0,
      tbinSec = 0.01, nbins = 64)
    dedispersed.samples
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("value"))
      .orderBy(col("bin"))
  }

  private val q53Sql = {
    val f = "110.0 + CAST(CAST(l_suppkey % 8 AS INT) AS DOUBLE) * 5.0"
    val delay = s"(1.0e7 * 30.0 / 2.41) * (1.0 / (($f) * ($f)) - 1.0 / (150.0 * 150.0))"
    s"""SELECT CAST(((l_partkey % 64 - CAST(round(($delay) / 1000.0 / 0.01) AS INT)) % 64 + 64) % 64 AS INT) AS bin,
       |  COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS value
       |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin
  }

  // --- q54: A9 off-window mean/rms --------------------------------------
  // Robust noise floor from an explicit off-pulse range
  // (`fluxcal/lofar_fluxcal.py:218-220`, `get_rough_tscat.py:76-78`).

  private def q54(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("hour_bin", ((col("ts_sec") % 86400L) / 3600L).cast(IntegerType))
    ev.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("hour_bin") < 6, 1L).otherwise(0L)).as("n_off"),
        (sum(when(col("hour_bin") < 6, d2(col("value")))).cast(DoubleType) /
          sum(when(col("hour_bin") < 6, 1L)).cast(DoubleType)).as("off_mean"),
        dsum(when(col("hour_bin") >= 6, col("value")).otherwise(lit(0.0)))
          .as("on_sum"))
      .orderBy(col("user_id"))
  }

  private val q54Sql =
    s"""WITH e AS (SELECT user_id, value,
       |    CAST(((epoch_ns(ts) // 1000000000) % 86400) // 3600 AS INT) AS hour_bin
       |  FROM events)
       |SELECT user_id, COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN hour_bin < 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_off,
       |  CAST(SUM(CASE WHEN hour_bin < 6 THEN ${sqlD2("value")} END) AS DOUBLE) /
       |    CAST(SUM(CASE WHEN hour_bin < 6 THEN 1 END) AS DOUBLE) AS off_mean,
       |  ${sqlDsum("CASE WHEN hour_bin >= 6 THEN value ELSE 0.0 END")} AS on_sum
       |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- q63: C4 transit-time computation ---------------------------------
  // Previous/next transit anchored on LST == RA (`scheduling/azlst.pl:
  // 1-245`), transit elevation + circumpolar flags with the reference's
  // 0.001° tolerance, approach minutes and anchor-transit choice for an
  // observing slot, and the bfscheduler score composed from them
  // (`scheduling/bfscheduler.py:277-311`). Everything here is the
  // multiply-add-mod/compare tier; the trig tier (HA at a given elevation,
  // rise/set LST) is spec-verified in AstroFunctionsSpec.

  private def q63(s: SparkSession, d: String): DataFrame = {
    import graft.functions.AstroFunctions._
    val lat = 52.915111; val lon = 6.869883; val el = 30.0
    val start = 56000.25; val end = 56000.5 // 6 h observing slot
    Tables.customer(s, d)
      .withColumn("ra_deg", ((col("c_custkey") * 7919) % 360).cast(DoubleType))
      .withColumn("dec_deg", ((col("c_custkey") * 7) % 180).cast(DoubleType) - 90.0)
      .withColumn("transit_el", transitElevation(col("dec_deg"), lit(lat)))
      .withColumn("never_sets", neverSets(col("dec_deg"), lit(lat), lit(el)))
      .withColumn("never_rises", neverRises(col("dec_deg"), lit(lat), lit(el)))
      .filter(col("transit_el") > 0.0)
      .withColumn("prev_transit",
        previousTransitMjd(lit(start), col("ra_deg"), lit(lon)))
      .withColumn("next_transit",
        col("prev_transit") + lit(360.0) / lit(LstRateDegPerDay))
      .withColumn("approach_min",
        transitApproachMin(lit(start), lit(end), col("prev_transit"), col("next_transit")))
      .withColumn("anchor_transit",
        chosenTransitMjd(lit(start), lit(end), col("prev_transit"), col("next_transit")))
      .withColumn("score",
        when(col("approach_min") > 0 && col("approach_min") <= 60.0,
          lit(100.0) + col("approach_min") / 10.0).otherwise(0.0) +
          lit(90.0) / col("transit_el") +
          when(col("next_transit") >= start && col("next_transit") <= end, 10.0)
            .otherwise(0.0))
      .select(col("c_custkey"), col("ra_deg"), col("dec_deg"),
        col("transit_el"), col("never_sets"), col("never_rises"),
        col("prev_transit"), col("next_transit"), col("approach_min"),
        col("anchor_transit"), col("score"))
      .orderBy(col("c_custkey"))
  }

  private val q63Sql = {
    import graft.functions.AstroFunctions._
    s"""WITH t AS (SELECT c_custkey,
       |    CAST((c_custkey * 7919) % 360 AS DOUBLE) AS ra_deg,
       |    CAST((c_custkey * 7) % 180 AS DOUBLE) - 90.0 AS dec_deg
       |  FROM customer),
       |f AS (SELECT c_custkey, ra_deg, dec_deg,
       |    ${sqlTransitElevation("dec_deg", "52.915111")} AS transit_el,
       |    ${sqlNeverSets("dec_deg", "52.915111", "30.0")} AS never_sets,
       |    ${sqlNeverRises("dec_deg", "52.915111", "30.0")} AS never_rises,
       |    ${sqlPreviousTransitMjd("56000.25", "ra_deg", "6.869883")} AS prev_transit
       |  FROM t),
       |g AS (SELECT *, prev_transit + 360.0e0 / 360.98564736629e0 AS next_transit
       |  FROM f WHERE transit_el > 0.0),
       |h AS (SELECT *,
       |    ${sqlTransitApproachMin("56000.25", "56000.5", "prev_transit", "next_transit")} AS approach_min,
       |    ${sqlChosenTransitMjd("56000.25", "56000.5", "prev_transit", "next_transit")} AS anchor_transit
       |  FROM g)
       |SELECT c_custkey, ra_deg, dec_deg, transit_el, never_sets, never_rises,
       |  prev_transit, next_transit, approach_min, anchor_transit,
       |  (CASE WHEN approach_min > 0 AND approach_min <= 60.0 THEN 100.0 + approach_min / 10.0 ELSE 0.0 END)
       |    + 90.0 / transit_el
       |    + (CASE WHEN next_transit >= 56000.25 AND next_transit <= 56000.5 THEN 10.0 ELSE 0.0 END) AS score
       |FROM h ORDER BY c_custkey""".stripMargin
  }

  // --- q67: A7 weight re-normalization through the REAL operator -------
  // ProfileOps.normalizeWeights (`lofar_fluxcal.py:409-431`): weights
  // scale by max(subint duration)/duration, then divide by the global
  // max — both global scalars broadcast 1-row joins. The events table
  // stands in as the cube's weight relation (cell weight = event count,
  // subint duration = active time span), so the driver's oracle verifies
  // the operator itself, not a re-derivation.

  private def q67(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("hour_bin", ((col("ts_sec") % 86400L) / 3600L).cast(IntegerType))
    val weights = ev.groupBy(col("user_id"), col("hour_bin"))
      .agg(count(lit(1)).cast(DoubleType).as("weight"))
      .select(lit("E").as("obs_id"), col("user_id").as("subint"),
        col("hour_bin").as("chan"), col("weight"))
    val durations = ev.groupBy(col("user_id"))
      .agg((max(col("ts_sec")) - min(col("ts_sec")) + 1L).cast(DoubleType).as("dur"))
      .select(lit("E").as("obs_id"), col("user_id").as("subint"), col("dur"))
    val cube = graft.operators.Cube(weights, weights) // samples unused here
    graft.operators.ProfileOps.normalizeWeights(cube, durations).weights
      .select(col("subint").as("user_id"), col("chan").as("hour_bin"),
        col("weight"))
      .orderBy(col("user_id"), col("hour_bin"))
  }

  private val q67Sql =
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec FROM events),
      |w AS (SELECT user_id, CAST((ts_sec % 86400) // 3600 AS INT) AS hour_bin,
      |    CAST(COUNT(*) AS DOUBLE) AS weight
      |  FROM e GROUP BY 1, 2),
      |d AS (SELECT user_id, CAST(MAX(ts_sec) - MIN(ts_sec) + 1 AS DOUBLE) AS dur
      |  FROM e GROUP BY 1),
      |md AS (SELECT MAX(dur) AS max_dur FROM d),
      |scaled AS (SELECT w.user_id, w.hour_bin, w.weight * md.max_dur / d.dur AS weight
      |  FROM w JOIN d ON w.user_id = d.user_id CROSS JOIN md),
      |mw AS (SELECT MAX(weight) AS max_w FROM scaled)
      |SELECT user_id, hour_bin,
      |  CASE WHEN mw.max_w > 0 THEN weight / mw.max_w ELSE 0.0 END AS weight
      |FROM scaled CROSS JOIN mw ORDER BY user_id, hour_bin""".stripMargin

  // --- q68: the analytic SEFD dimension, end-to-end --------------------
  // FluxCal.sefdDim with the ArisN model — the per-channel Tinst + Tsky +
  // Aeff radiometer algebra that scales every calibrated sample
  // (`lofar_fluxcal.py:662-749`). The oracle recomposes the same chain
  // from the sql* mirrors, so the flagship dimension is driver-verified
  // bit-for-bit, not just spec-checked.

  private def q68(s: SparkSession, d: String): DataFrame = {
    import graft.pipelines.FluxCal
    val cfg = FluxCal.Config(dm = 0.0, f0Mhz = 110.0, chanBwMhz = 0.1953125,
      nchan = 400, nbins = 1, tbinSec = 1.0, tsubSec = 10.0)
    FluxCal.sefdDim(s, cfg)
      .select(col("chan"), col("freq"), col("tinst"), col("tsky"),
        col("tsys"), col("aeff"), col("sefd"))
      .orderBy(col("chan"))
  }

  private val q68Sql = {
    import graft.functions.AstroFunctions._
    val f = "(110.0e0 + CAST(i AS DOUBLE) * 0.1953125e0)"
    val tinst = sqlTinstHba(f)
    val tsky = sqlTskyPortable("25.0e0", f)
    val aeff = sqlAeffMax("TRUE", "(24.0e0 * 24.0e0)", f)
    s"""SELECT CAST(i AS INT) AS chan, $f AS freq,
       |  $tinst AS tinst, $tsky AS tsky,
       |  ($tinst + $tsky) AS tsys,
       |  $aeff AS aeff,
       |  2.0e0 * 1380.6485279e0 * ($tinst + $tsky) / ((1.0e0 - 0.05e0) * $aeff) AS sefd
       |FROM range(0, 400) t(i) ORDER BY chan""".stripMargin
  }

  // --- q81: R3 period doubling + wrap-crossing boxcar -------------------
  // Driven by the REAL `ProfileOps.periodDouble` operator (the q52/q53
  // pattern): the folded profile is appended to itself with bins shifted
  // one period (`pulsestack.py:735-737`), exactly so a matched-filter
  // boxcar can cross the wrap boundary — a boxcar anchored at bin 60 of
  // 64 reads bins 60..67, i.e. into the doubled half. The profile values
  // stay DECIMAL through the window sum (exact + associative, so Spark's
  // sliding add/remove frame and the oracle's per-frame sum agree
  // bitwise) and surface as double only at the end.

  private def q81(s: SparkSession, d: String): DataFrame = {
    val samples = Tables.lineitem(s, d)
      .withColumn("bin", (col("l_partkey") % 64).cast(IntegerType))
    val doubled = graft.operators.ProfileOps.periodDouble(
      graft.operators.Cube(samples, samples), nbins = 64)
    val prof = doubled.samples
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(d2(col("l_extendedprice"))).as("dval"))
    val w = Window.orderBy(col("bin")).rowsBetween(0, 7)
    prof
      .withColumn("boxcar", sum(col("dval")).over(w).cast(DoubleType))
      .filter(col("bin") < 64)
      .select(col("bin"), col("n"), col("dval").cast(DoubleType).as("value"),
        col("boxcar"))
      .orderBy(col("bin"))
  }

  private val q81Sql =
    s"""WITH s AS (SELECT CAST(l_partkey % 64 AS INT) AS bin, l_extendedprice FROM lineitem
       |  UNION ALL
       |  SELECT CAST(l_partkey % 64 AS INT) + 64 AS bin, l_extendedprice FROM lineitem),
       |prof AS (SELECT bin, COUNT(*) AS n, SUM(${sqlD2("l_extendedprice")}) AS dval
       |  FROM s GROUP BY bin),
       |box AS (SELECT bin, n, dval,
       |    CAST(SUM(dval) OVER (ORDER BY bin ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS DOUBLE) AS boxcar
       |  FROM prof)
       |SELECT bin, n, CAST(dval AS DOUBLE) AS value, boxcar
       |FROM box WHERE bin < 64 ORDER BY bin""".stripMargin

  // --- q82: W4 auto off-window through the REAL operator ----------------
  // `ProfileOps.autoOffWindow` (snr.py:104-146) driven end-to-end: a
  // profile synthesized from lineitem with a planted pulse (bins 20..24
  // spiked by (bin−19)·10⁹ — three orders above the base sums, so the
  // μ+2.5σ threshold decisions carry ~20% margins and survive last-ulp
  // float differences between engines), island-detected, expanded, and
  // rotated so the window's left edge lands at bin 0. Integer outputs
  // (rotation, window bounds, re-keyed bins) + pass-through values make
  // the compare exact even though μ/σ differ in the last bits.
  private def q82(s: SparkSession, d: String): DataFrame = {
    val prof = Tables.lineitem(s, d)
      .withColumn("obs_id", concat(lit("obs"), (col("l_suppkey") % 2).cast(StringType)))
      .withColumn("pol", (col("l_linenumber") % 2).cast(IntegerType))
      .withColumn("bin", (col("l_partkey") % 64).cast(IntegerType))
      .groupBy(col("obs_id"), col("pol"), col("bin"))
      .agg(dsum(col("l_extendedprice")).as("base"))
      .withColumn("value",
        col("base") + when(col("bin").between(20, 24),
          (col("bin") - 19).cast(DoubleType) * 1e9).otherwise(0.0))
      .select(col("obs_id"), col("pol"), col("bin"), col("value"))
      // autoOffWindow reads its profile input four times (stats, flagged,
      // rotated, bounds) and DataFrame plans share no subtrees — without
      // this the lineitem aggregation above runs once per read. The
      // aggregated profile is nobs*npol*nbins rows at ANY corpus size, so
      // caching it is scale-safe.
      .cache()
    val (rotated, bounds) =
      graft.operators.ProfileOps.autoOffWindow(prof, nbins = 64)
    rotated.join(bounds, Seq("obs_id", "pol"))
      .filter(col("bin") < 10)
      .select(col("obs_id"), col("pol"), col("bin"), col("value"),
        col("rot_bins"), col("off_lo"), col("off_hi"))
      .orderBy(col("obs_id"), col("pol"), col("bin"))
  }

  /** Oracle: by construction the flagged bins form ONE consecutive
    * island, so min/max over flagged bins IS the best island; expansion
    * and rotation replay the operator's integer arithmetic. */
  private val q82Sql =
    s"""WITH prof AS (SELECT 'obs' || CAST(l_suppkey % 2 AS VARCHAR) AS obs_id,
       |    CAST(l_linenumber % 2 AS INT) AS pol, CAST(l_partkey % 64 AS INT) AS bin,
       |    ${sqlDsum("l_extendedprice")} AS base
       |  FROM lineitem GROUP BY 1, 2, 3),
       |v AS (SELECT obs_id, pol, bin,
       |    base + CASE WHEN bin BETWEEN 20 AND 24
       |      THEN CAST(bin - 19 AS DOUBLE) * 1e9 ELSE 0.0 END AS value
       |  FROM prof),
       |stats AS (SELECT obs_id, pol, AVG(value) AS m, STDDEV_POP(value) AS sd
       |  FROM v GROUP BY 1, 2),
       |flagged AS (SELECT v.obs_id, v.pol, v.bin
       |  FROM v JOIN stats USING (obs_id, pol) WHERE value > m + sd * 2.5),
       |isl AS (SELECT obs_id, pol, MIN(bin) AS bin_lo, MAX(bin) AS bin_hi
       |  FROM flagged GROUP BY 1, 2),
       |win AS (SELECT obs_id, pol,
       |    CAST(bin_lo - FLOOR((bin_hi - bin_lo) * 0.15) AS INT) AS le,
       |    CAST(bin_hi + 1 + FLOOR((bin_hi - bin_lo) * 0.15) AS INT) AS re
       |  FROM isl)
       |SELECT v.obs_id AS obs_id, v.pol AS pol,
       |  CAST(((v.bin - COALESCE(w.le, 0)) % 64 + 64) % 64 AS INT) AS bin, v.value AS value,
       |  COALESCE(w.le, 0) AS rot_bins,
       |  COALESCE(w.re - w.le, 0) AS off_lo, 64 AS off_hi
       |FROM v LEFT JOIN win w USING (obs_id, pol)
       |WHERE ((v.bin - COALESCE(w.le, 0)) % 64 + 64) % 64 < 10
       |ORDER BY obs_id, pol, bin""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q48_flagged_tiles", q48, Some(q48Sql), Seq("F10", "A15", "J9")),
    GQuery("q49_scheduler_score", q49, Some(q49Sql), Seq("A24", "W5", "O4")),
    GQuery("q50_polyco_phase", q50, Some(q50Sql), Seq("C14", "J10")),
    GQuery("q51_badchunk_mask", q51, Some(q51Sql), Seq("A13", "W6")),
    GQuery("q52_rotate_rekey", q52, Some(q52Sql), Seq("R1", "A2")),
    GQuery("q53_dedisperse_rekey", q53, Some(q53Sql), Seq("R2", "A4")),
    GQuery("q81_period_double_boxcar", q81, Some(q81Sql), Seq("R3", "W3")),
    GQuery("q82_auto_off_window", q82, Some(q82Sql), Seq("W4", "W1", "R1")),
    GQuery("q54_offwindow_stats", q54, Some(q54Sql), Seq("A9", "F8")),
    GQuery("q63_transit_times", q63, Some(q63Sql), Seq("C4", "C3", "A24")),
    GQuery("q67_weight_renorm", q67, Some(q67Sql), Seq("A7", "A6")),
    GQuery("q68_sefd_dim", q68, Some(q68Sql), Seq("C6", "C7", "C8", "C9", "F11")))
}
