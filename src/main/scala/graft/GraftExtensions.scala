package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.expressions.{CdcBounds, CellTop, FloatDot, FloatSub, PolyHash, PolyHash2, PqAdc, PqDistTable, PqEncode, SimHash32, SimHash60, SortedIntersectCount, SubspaceL2}
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

  private def reg(ext: SparkSessionExtensions, name: String, arity: Int,
                  builder: Seq[Expression] => Expression,
                  implClass: Class[_] = classOf[GraftExtensions]): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(implClass.getName, name),
      (children: Seq[Expression]) => {
        // arity guard: a wrong-arity SQL call must fail with the function
        // name, not a raw IndexOutOfBoundsException from the builder
        if (children.length != arity)
          throw new IllegalArgumentException(
            s"$name expects $arity argument(s), got ${children.length}")
        builder(children)
      }))

  private def lift(f: Seq[Column] => Column): Seq[Expression] => Expression =
    children => ColumnBridge.catalystExpression(f(children.map(ColumnBridge.column)))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // native codegen kernels
    reg(ext, "poly_hash", 1, c => PolyHash(c.head), classOf[PolyHash])
    reg(ext, "float_dot", 2, c => FloatDot(c(0), c(1)), classOf[FloatDot])
    reg(ext, "sorted_intersect_count", 2,
      c => SortedIntersectCount(c(0), c(1)), classOf[SortedIntersectCount])
    reg(ext, "simhash32", 1, c => SimHash32(c.head), classOf[SimHash32])
    reg(ext, "simhash60", 1, c => SimHash60(c.head), classOf[SimHash60])
    reg(ext, "poly_hash2", 1, c => PolyHash2(c.head), classOf[PolyHash2])
    reg(ext, "pq_encode", 3, c => PqEncode(c(0), c(1), c(2)), classOf[PqEncode])
    reg(ext, "cell_top", 4, c => CellTop(c(0), c(1), c(2), c(3)), classOf[CellTop])
    reg(ext, "pq_dtab", 3, c => PqDistTable(c(0), c(1), c(2)), classOf[PqDistTable])
    reg(ext, "pq_adc", 2, c => PqAdc(c(0), c(1)), classOf[PqAdc])
    reg(ext, "subspace_l2", 3, c => SubspaceL2(c(0), c(1), c(2)), classOf[SubspaceL2])
    reg(ext, "float_sub", 2, c => FloatSub(c(0), c(1)), classOf[FloatSub])
    // cdc_bounds(text, w, d): w and d must be foldable integer literals
    reg(ext, "cdc_bounds", 3, { c =>
      def litInt(e: Expression, name: String): Long = e match {
        case f if f.foldable => f.eval() match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"cdc_bounds $name must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          s"cdc_bounds $name must be a literal")
      }
      CdcBounds(c(0), litInt(c(1), "window").toInt, litInt(c(2), "divisor"))
    }, classOf[CdcBounds])

    // C6-C11 calibration/physics pack
    import AstroFunctions._
    reg(ext, "tinst_hba", 1, lift(a => tinstHba(a(0))))
    reg(ext, "tsky_portable", 2, lift(a => tskyPortable(a(0), a(1))))
    reg(ext, "chan_freq", 3, lift(a => chanFreq(a(0), a(1), a(2))))
    reg(ext, "aeff_max", 3, lift(a => aeffMax(a(0), a(1), a(2))))
    reg(ext, "dispersion_delay_ms", 3, lift(a => dispersionDelayMs(a(0), a(1), a(2))))
    reg(ext, "dispersion_pair_ms", 3, lift(a => dispersionPairMs(a(0), a(1), a(2))))
    // C1 sexagesimal
    reg(ext, "ra_to_deg", 1, lift(a => raToDeg(a(0))))
    reg(ext, "dec_to_deg", 1, lift(a => decToDeg(a(0))))
    // C3/C4 sidereal + transit pack
    reg(ext, "lst_deg", 2, lift(a => lstDeg(a(0), a(1))))
    reg(ext, "previous_transit_mjd", 3, lift(a => previousTransitMjd(a(0), a(1), a(2))))
    reg(ext, "next_transit_mjd", 3, lift(a => nextTransitMjd(a(0), a(1), a(2))))
    reg(ext, "transit_elevation", 2, lift(a => transitElevation(a(0), a(1))))
    reg(ext, "never_sets", 3, lift(a => neverSets(a(0), a(1), a(2))))
    reg(ext, "never_rises", 3, lift(a => neverRises(a(0), a(1), a(2))))
    reg(ext, "transit_approach_min", 4, lift(a => transitApproachMin(a(0), a(1), a(2), a(3))))
    reg(ext, "chosen_transit_mjd", 4, lift(a => chosenTransitMjd(a(0), a(1), a(2), a(3))))
    reg(ext, "ha_at_elevation", 3, lift(a => haAtElevation(a(0), a(1), a(2))))
    reg(ext, "eq_to_gal", 2, lift(a => eqToGal(a(0), a(1))))
    reg(ext, "az_el", 4, lift(a => azEl(a(0), a(1), a(2), a(3))))
    // C5 time helpers
    reg(ext, "mjd_to_dublin", 1, lift(a => mjdToDublin(a(0))))
    reg(ext, "mjd_to_unix_sec", 1, lift(a => mjdToUnixSec(a(0))))
    reg(ext, "mjd_round_to_minute", 1, lift(a => mjdRoundToMinute(a(0))))
    reg(ext, "mjd_to_utc", 1, lift(a => mjdToUtc(a(0))))
    // F9 finite cleanup
    reg(ext, "finite_or", 1, lift(a => ProfileOps.finiteOr(a(0))))

    // curation text pack: the q28/q56/q70 primitives as SQL functions.
    // word_shingles3 takes the TOKEN ARRAY (materialize ws_tokens(text)
    // in a subquery first — see the wordShingles3 scaladoc on lambda
    // re-evaluation of inline expressions).
    import graft.functions.TextFunctions
    reg(ext, "ws_tokens", 1, lift(a => TextFunctions.tokens(a(0))))
    reg(ext, "word_shingles3", 1, lift(a => TextFunctions.wordShingles3(a(0))))
    // 1-arg SQL form: tokenizes inline (3 of the 4 counters re-split the
    // row — acceptable per-row cost for the SQL surface; the Column API
    // callers materialize the token array first, per the contract at
    // TextFunctions.qualityCounters).
    reg(ext, "quality_score", 1, lift { a =>
      val (nTokens, sumLen, nStop, nPunct) =
        TextFunctions.qualityCounters(TextFunctions.tokens(a(0)), a(0))
      TextFunctions.qualityScore(nTokens, sumLen, nStop, nPunct)
    })
  }
}
