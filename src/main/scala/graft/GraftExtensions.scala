package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.expressions.{FloatDot, PolyHash, SimHash32, SortedIntersectCount}
import graft.functions.AstroFunctions
import graft.operators.ProfileOps

/** Engine extension point (SparkSessionExtensions): registers the native
  * codegen expressions AND the domain scalar pack so the full function
  * surface is usable from `spark.sql(...)` text as well as the Column
  * API — a user of the reference scripts can express every calibration
  * formula in plain SQL. Injected by GraftSession; also loadable
  * standalone via `spark.sql.extensions=graft.GraftExtensions`.
  *
  * The scalar-pack functions expand to the SAME Column-algebra trees the
  * library uses (ColumnBridge lifts them into expressions), so they stay
  * codegen'd and bitwise-identical to the programmatic API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def reg(ext: SparkSessionExtensions, name: String,
                  builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder))

  private def lift(f: Seq[Column] => Column): Seq[Expression] => Expression =
    children => ColumnBridge.catalystExpression(f(children.map(ColumnBridge.column)))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // native codegen kernels
    reg(ext, "poly_hash", children => PolyHash(children.head))
    reg(ext, "float_dot", children => FloatDot(children(0), children(1)))
    reg(ext, "sorted_intersect_count",
      children => SortedIntersectCount(children(0), children(1)))
    reg(ext, "simhash32", children => SimHash32(children.head))

    // C6-C11 calibration/physics pack
    import AstroFunctions._
    reg(ext, "tinst_hba", lift(a => tinstHba(a(0))))
    reg(ext, "tsky_portable", lift(a => tskyPortable(a(0), a(1))))
    reg(ext, "chan_freq", lift(a => chanFreq(a(0), a(1), a(2))))
    reg(ext, "aeff_max", lift(a => aeffMax(a(0), a(1), a(2))))
    reg(ext, "dispersion_delay_ms", lift(a => dispersionDelayMs(a(0), a(1), a(2))))
    reg(ext, "dispersion_pair_ms", lift(a => dispersionPairMs(a(0), a(1), a(2))))
    // C1 sexagesimal
    reg(ext, "ra_to_deg", lift(a => raToDeg(a(0))))
    reg(ext, "dec_to_deg", lift(a => decToDeg(a(0))))
    // C3/C4 sidereal + transit pack
    reg(ext, "lst_deg", lift(a => lstDeg(a(0), a(1))))
    reg(ext, "previous_transit_mjd", lift(a => previousTransitMjd(a(0), a(1), a(2))))
    reg(ext, "next_transit_mjd", lift(a => nextTransitMjd(a(0), a(1), a(2))))
    reg(ext, "transit_elevation", lift(a => transitElevation(a(0), a(1))))
    reg(ext, "never_sets", lift(a => neverSets(a(0), a(1), a(2))))
    reg(ext, "never_rises", lift(a => neverRises(a(0), a(1), a(2))))
    reg(ext, "transit_approach_min", lift(a => transitApproachMin(a(0), a(1), a(2), a(3))))
    reg(ext, "chosen_transit_mjd", lift(a => chosenTransitMjd(a(0), a(1), a(2), a(3))))
    reg(ext, "ha_at_elevation", lift(a => haAtElevation(a(0), a(1), a(2))))
    reg(ext, "eq_to_gal", lift(a => eqToGal(a(0), a(1))))
    reg(ext, "az_el", lift(a => azEl(a(0), a(1), a(2), a(3))))
    // C5 time helpers
    reg(ext, "mjd_to_dublin", lift(a => mjdToDublin(a(0))))
    reg(ext, "mjd_to_unix_sec", lift(a => mjdToUnixSec(a(0))))
    reg(ext, "mjd_round_to_minute", lift(a => mjdRoundToMinute(a(0))))
    reg(ext, "mjd_to_utc", lift(a => mjdToUtc(a(0))))
    // F9 finite cleanup
    reg(ext, "finite_or", lift(a => ProfileOps.finiteOr(a(0))))
  }
}
