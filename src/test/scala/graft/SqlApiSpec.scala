package graft

import org.apache.spark.sql.functions._
import graft.functions.AstroFunctions._

/** The SQL function surface registered by GraftExtensions must expand to
  * the SAME expression trees as the Column API — asserted bitwise. */
class SqlApiSpec extends SparkSpecBase {
  import spark.implicits._

  private def both(sqlExpr: String, c: org.apache.spark.sql.Column): Unit = {
    val (s, d) = spark.range(1)
      .select(expr(sqlExpr).cast("double").as("s"), c.cast("double").as("d"))
      .as[(Double, Double)].head()
    assert(java.lang.Double.doubleToRawLongBits(s) ==
      java.lang.Double.doubleToRawLongBits(d),
      s"$sqlExpr: sql=$s column=$d")
  }

  test("scalar pack SQL functions are bitwise-identical to the Column API") {
    both("tinst_hba(151.0)", tinstHba(lit(151.0)))
    both("tsky_portable(25.0, 150.0)", tskyPortable(lit(25.0), lit(150.0)))
    both("chan_freq(110.0, 37, 0.1953125)",
      chanFreq(lit(110.0), lit(37), lit(0.1953125)))
    both("aeff_max(true, 1152.0, 150.0)",
      aeffMax(lit(true), lit(1152.0), lit(150.0)))
    both("dispersion_pair_ms(26.8, 110.0, 190.0)",
      dispersionPairMs(lit(26.8), lit(110.0), lit(190.0)))
    both("ra_to_deg('05:34:31.9')", raToDeg(lit("05:34:31.9")))
    both("lst_deg(56000.25, 6.869883)", lstDeg(lit(56000.25), lit(6.869883)))
    both("next_transit_mjd(56000.25, 83.633, 6.869883)",
      nextTransitMjd(lit(56000.25), lit(83.633), lit(6.869883)))
    both("transit_elevation(22.01, 52.915111)",
      transitElevation(lit(22.01), lit(52.915111)))
    // D suffix: SQL decimal literals would otherwise subtract exactly
    // where the Column API's double literals round — the function must be
    // compared on identical input types
    both("transit_approach_min(56000.25D, 56000.5D, 56000.2D, 56001.19D)",
      transitApproachMin(lit(56000.25), lit(56000.5), lit(56000.2), lit(56001.19)))
    both("mjd_to_unix_sec(51544.5)", mjdToUnixSec(lit(51544.5)))
    both("mjd_round_to_minute(56000.2503)", mjdRoundToMinute(lit(56000.2503)))
    both("finite_or(cast('NaN' as double))",
      graft.operators.ProfileOps.finiteOr(lit(Double.NaN)))
    both("ha_at_elevation(30.0, 22.0, 52.915111)",
      haAtElevation(lit(30.0), lit(22.0), lit(52.915111)))
  }

  test("a pure-SQL scheduler query runs against registered functions") {
    // the q63 core expressed entirely as SQL text — the reference's
    // azlst.pl capability with zero Scala
    val df = spark.sql(
      """SELECT id,
        |  next_transit_mjd(56000.25, CAST(id * 37 % 360 AS DOUBLE), 6.869883) AS nt,
        |  transit_elevation(CAST(id % 90 AS DOUBLE), 52.915111) AS el,
        |  never_sets(CAST(id % 90 AS DOUBLE), 52.915111, 30.0) AS ns
        |FROM range(0, 100)""".stripMargin)
    assert(df.count() == 100)
    val row = df.filter($"id" === 1).select($"nt", $"el").as[(Double, Double)].head()
    assert(row._1 > 56000.25 && row._1 < 56001.25)
    assert(row._2 == 90.0 - math.abs(52.915111 - 1.0))
  }

  test("struct-returning functions work from SQL (eq_to_gal, az_el)") {
    val gb = spark.sql("SELECT eq_to_gal(192.85948, 27.12825).gb AS gb")
      .as[Double].head()
    assert(math.abs(gb - 90.0) < 1e-6) // north galactic pole
    val el = spark.sql("SELECT az_el(100.0, 52.9, 52.9, 100.0).el AS el")
      .as[Double].head()
    assert(math.abs(el - 90.0) < 1e-6) // zenith at transit when dec = lat
  }

  test("curation text pack from SQL matches the Column API") {
    val t = "the quick fox jumps, over the lazy dog."
    both(s"quality_score('$t')", {
      val (a, b, c, d) = graft.functions.TextFunctions.qualityCounters(
        graft.functions.TextFunctions.tokens(lit(t)), lit(t))
      graft.functions.TextFunctions.qualityScore(a, b, c, d)
    })
    val (s, c) = spark.range(1).select(
      expr(s"word_shingles3(ws_tokens('$t'))").as("s"),
      graft.functions.TextFunctions.wordShingles3(
        graft.functions.TextFunctions.tokens(lit(t))).as("c"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(s == c && s.nonEmpty)
  }
}
