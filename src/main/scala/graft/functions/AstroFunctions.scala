package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pulsar/radio-astronomy scalar pack (SURVEY.md §2.8 C1–C11) as pure
  * `Column` algebra — codegen'd, no UDFs, per-row work only.
  *
  * Two numeric tiers:
  *
  * 1. **Bitwise-portable** functions use only IEEE-exact-or-correctly-
  *    rounded ops (+ − × / sqrt, integer and string ops). An identical
  *    expression tree evaluates bit-identically on Spark and on the
  *    DuckDB oracle, so these back oracle-verified queries. Each has a
  *    paired `sql*` fragment generator that emits the SAME tree as SQL.
  *
  * 2. **Transcendental** functions (coordinate rotations, sidereal time)
  *    use trig/log and are verified by ScalaTest against published
  *    values instead (libm vs JVM may differ in the last ulp).
  *
  * Formula provenance (semantics, not code): dispersion delay
  * `simple-sh-scripts/dide:13-14`, `tau:12`; Tinst polynomials (fit to
  * Wijnholds 2011) `fluxcal/lofar_tinst.py:45,60`; Tsky power law
  * `fluxcal/tsky.py:1059`; pulsar derived quantities
  * `simple-sh-scripts/ppdot:28-97`; radiometer sensitivity
  * `fluxcal/lofar_fluxcal.py:545-547`; sexagesimal parsing
  * `fluxcal/lofar_fluxcal.py:238-243`; galactic conversion
  * `fluxcal/tsky.py:1116-1123`; LST/az-el `scheduling/azza.pl`, `sid.pl`.
  */
object AstroFunctions {

  // ---------- generic Horner polynomial (C7), highest coefficient first

  def horner(x: Column, coeffs: Seq[Double]): Column =
    coeffs.tail.foldLeft(lit(coeffs.head): Column)((acc, c) => acc * x + lit(c))

  def sqlHorner(x: String, coeffs: Seq[Double]): String =
    coeffs.tail.foldLeft(coeffs.head.toString)((acc, c) => s"(($acc) * ($x) + $c)")

  /** LOFAR HBA instrument temperature poly, f in MHz (110–250).
    * Coefficients: `fluxcal/lofar_tinst.py:60`. */
  val TinstHbaCoeffs: Seq[Double] = Seq(
    6.64031379234e-08, -6.27815750717e-05, 0.0246844426766,
    -5.16281033712, 605.474082663, -37730.3913315, 975867.990312)

  /** LOFAR LBA instrument temperature poly, f in MHz (10–90).
    * Coefficients: `fluxcal/lofar_tinst.py:45`. */
  val TinstLbaCoeffs: Seq[Double] = Seq(
    6.2699888333e-05, -0.019932340239, 2.60625093843,
    -179.560314268, 6890.14953844, -140196.209123, 1189842.07708)

  def tinstHba(freqMhz: Column): Column = horner(freqMhz, TinstHbaCoeffs)
  def sqlTinstHba(f: String): String = sqlHorner(f, TinstHbaCoeffs)
  def tinstLba(freqMhz: Column): Column = horner(freqMhz, TinstLbaCoeffs)

  // ---------- dispersion (C10)

  /** In-band dispersion delay in ms: 2e7·DM·band/(2.41·f³)
    * (`simple-sh-scripts/dide:13-14`; DM pc/cm³, band & f MHz). */
  def dispersionDelayMs(dm: Column, bandMhz: Column, freqMhz: Column): Column =
    (lit(2.0e7) * dm * bandMhz) / (lit(2.41) * freqMhz * freqMhz * freqMhz)

  def sqlDispersionDelayMs(dm: String, band: String, f: String): String =
    s"(2.0e7 * ($dm) * ($band)) / (2.41 * ($f) * ($f) * ($f))"

  /** Two-frequency dispersion delay in ms: (1e7·DM/2.41)·(f₂⁻²−f₁⁻²)
    * (`simple-sh-scripts/tau:12`; f₂ < f₁, MHz). */
  def dispersionPairMs(dm: Column, fLo: Column, fHi: Column): Column =
    (lit(1.0e7) * dm / lit(2.41)) *
      (lit(1.0) / (fLo * fLo) - lit(1.0) / (fHi * fHi))

  def sqlDispersionPairMs(dm: String, fLo: String, fHi: String): String =
    s"(1.0e7 * ($dm) / 2.41) * (1.0 / (($fLo) * ($fLo)) - 1.0 / (($fHi) * ($fHi)))"

  /** Channel center frequency (F11): lowfreq + chan·chanBw
    * (`fluxcal/lofar_fluxcal.py:662`). */
  def chanFreq(lowFreq: Column, chan: Column, chanBw: Column): Column =
    lowFreq + chan.cast(DoubleType) * chanBw

  // ---------- sky temperature (C6)

  /** Tsky = 2.7 + T408·(f/408)^α, α = −2.5 bitwise-portable variant:
    * (408/f)^2.5 = r²·√r (`fluxcal/tsky.py:1059`; default α=−2.55 at
    * `:1136-1137` — available via [[tskyPowerLaw]]). */
  def tskyPortable(t408: Column, freqMhz: Column): Column = {
    val r = lit(408.0) / freqMhz
    lit(2.7) + t408 * (r * r * sqrt(r))
  }

  def sqlTskyPortable(t408: String, f: String): String =
    s"(2.7 + ($t408) * ((408.0 / ($f)) * (408.0 / ($f)) * sqrt(408.0 / ($f))))"

  /** General power-law Tsky (transcendental tier). */
  def tskyPowerLaw(t408: Column, freqMhz: Column, alpha: Double = -2.55): Column =
    lit(2.7) + t408 * pow(freqMhz / lit(408.0), lit(alpha))

  /** Haslam grid bucket indices (J7): l = ⌊(⌊gl+0.5⌋ mod 360)/4⌋,
    * b = min(⌊gb+90.5⌋, 179) (`fluxcal/tsky.py:1052-1056`). */
  def haslamL(gl: Column): Column =
    ((floor(gl + 0.5).cast(IntegerType) % 360) / 4).cast(IntegerType)
  def haslamB(gb: Column): Column =
    least(floor(gb + 90.5).cast(IntegerType), lit(179))

  // ---------- pulsar derived quantities (C11), `simple-sh-scripts/ppdot`
  // p in seconds, pdot15 = Ṗ/1e-15 (the script's scaled convention)

  /** Characteristic age in Myr: 15.8·P/Ṗ₁₅ (`ppdot:28-32`). */
  def charAgeMyr(p: Column, pdot15: Column): Column = lit(15.8) * p / pdot15

  /** Spin-down luminosity erg/s: 3.95e31·Ṗ₁₅/P³ (`ppdot:34-38`). */
  def edot(p: Column, pdot15: Column): Column =
    lit(3.95e31) * pdot15 / p / p / p

  /** Surface field in G: 1e12·√(P·Ṗ₁₅) (`ppdot:40-44`). */
  def bSurf(p: Column, pdot15: Column): Column = lit(1.0e12) * sqrt(p * pdot15)

  /** Light-cylinder field in G: 9.2·√Ṗ₁₅/(√P·P²) (`ppdot:46-50`). */
  def bLc(p: Column, pdot15: Column): Column =
    lit(9.2) * sqrt(pdot15) / (sqrt(p) * p * p)

  /** Goldreich–Julian density cm⁻³: 7e10·√(Ṗ₁₅/P) (`ppdot:54-58`). */
  def nGj(p: Column, pdot15: Column): Column = lit(7.0e10) * sqrt(pdot15 / p)

  /** Polar-cap radius m: 150/√P (`ppdot:60-64`). */
  def rPolarCap(p: Column): Column = lit(150.0) / sqrt(p)

  /** Light-cylinder radius km: 4.77e4·P (`ppdot:66-70`). */
  def rLc(p: Column): Column = lit(4.77e4) * p

  /** Polar-cap potential drop V: 2e13·√(Ṗ₁₅/P)/P (`ppdot:72-76`). */
  def dPhi(p: Column, pdot15: Column): Column =
    lit(2.0e13) * sqrt(pdot15 / p) / p

  def sqlCharAgeMyr(p: String, pd: String): String = s"(15.8 * ($p) / ($pd))"
  def sqlEdot(p: String, pd: String): String = s"(3.95e31 * ($pd) / ($p) / ($p) / ($p))"
  def sqlBSurf(p: String, pd: String): String = s"(1.0e12 * sqrt(($p) * ($pd)))"
  def sqlBLc(p: String, pd: String): String = s"(9.2 * sqrt($pd) / (sqrt($p) * ($p) * ($p)))"
  def sqlNGj(p: String, pd: String): String = s"(7.0e10 * sqrt(($pd) / ($p)))"
  def sqlRPolarCap(p: String): String = s"(150.0 / sqrt($p))"
  def sqlRLc(p: String): String = s"(4.77e4 * ($p))"
  def sqlDPhi(p: String, pd: String): String = s"(2.0e13 * sqrt(($pd) / ($p)) / ($p))"

  // ---------- radiometer sensitivity (C9), `fluxcal/lofar_fluxcal.py:545-547`

  /** ΔS (mJy-scale) = 1e3·1e23·2·β·k_B /
    * ((1−badFrac)·1e4·coherence(N)·√(npol·Δf·τ)). The station-combination
    * exponent is a knob (reference N^0.85); the bitwise-portable tier uses
    * coherence = N·√N is NOT offered — pass the coherence factor already
    * computed so the caller picks the tier. */
  def radiometerDeltaS(beta: Column, badFrac: Column, coherence: Column,
                       npol: Column, bwHz: Column, tobsSec: Column): Column =
    (lit(1.0e3) * lit(1.0e23) * lit(2.0) * beta * lit(1.38064852e-23)) /
      ((lit(1.0) - badFrac) * lit(1.0e4) * coherence *
        sqrt(npol * bwHz * tobsSec))

  def sqlRadiometerDeltaS(beta: String, badFrac: String, coh: String,
                          npol: String, bw: String, tobs: String): String =
    s"((1.0e3 * 1.0e23 * 2.0 * ($beta) * 1.38064852e-23) / " +
      s"((1.0 - ($badFrac)) * 1.0e4 * ($coh) * sqrt(($npol) * ($bw) * ($tobs))))"

  // ---------- sexagesimal (C1), `fluxcal/lofar_fluxcal.py:238-243`

  /** "hh:mm:ss.s" → degrees: (h + m/60 + s/3600)·15. */
  def raToDeg(ra: Column): Column = {
    val p = split(ra, ":")
    (element_at(p, 1).cast(DoubleType) +
      element_at(p, 2).cast(DoubleType) / lit(60.0) +
      element_at(p, 3).cast(DoubleType) / lit(3600.0)) * lit(15.0)
  }

  def sqlRaToDeg(ra: String): String =
    s"((CAST(string_split($ra, ':')[1] AS DOUBLE) + " +
      s"CAST(string_split($ra, ':')[2] AS DOUBLE) / 60.0 + " +
      s"CAST(string_split($ra, ':')[3] AS DOUBLE) / 3600.0) * 15.0)"

  /** "±dd:mm:ss.s" → degrees, sign applied to all terms. */
  def decToDeg(dec: Column): Column = {
    val p = split(dec, ":")
    val dd = element_at(p, 1).cast(DoubleType)
    val sign = when(substring(dec, 1, 1) === "-", lit(-1.0)).otherwise(lit(1.0))
    sign * (abs(dd) + element_at(p, 2).cast(DoubleType) / lit(60.0) +
      element_at(p, 3).cast(DoubleType) / lit(3600.0))
  }

  def sqlDecToDeg(dec: String): String = {
    val p = s"string_split($dec, ':')"
    s"((CASE WHEN substring($dec, 1, 1) = '-' THEN -1.0 ELSE 1.0 END) * " +
      s"(abs(CAST($p[1] AS DOUBLE)) + CAST($p[2] AS DOUBLE) / 60.0 + " +
      s"CAST($p[3] AS DOUBLE) / 3600.0))"
  }

  // ---------- transcendental tier (ScalaTest-verified, no oracle pairing)

  private def d2r(c: Column): Column = c * lit(math.Pi / 180.0)
  private def r2d(c: Column): Column = c * lit(180.0 / math.Pi)

  /** Equatorial J2000 → galactic (l, b) in degrees as a struct
    * (`fluxcal/tsky.py:1116-1123` semantics; NGP at α=192.85948°,
    * δ=27.12825°, l_NCP=122.93192°). */
  def eqToGal(raDeg: Column, decDeg: Column): Column = {
    val raNgp = lit(math.toRadians(192.85948))
    val decNgp = lit(math.toRadians(27.12825))
    val lNcp = lit(122.93192)
    val ra = d2r(raDeg); val dec = d2r(decDeg)
    val sinB = sin(dec) * sin(decNgp) + cos(dec) * cos(decNgp) * cos(ra - raNgp)
    val b = asin(sinB)
    val y = cos(dec) * sin(ra - raNgp)
    val x = sin(dec) * cos(decNgp) - cos(dec) * sin(decNgp) * cos(ra - raNgp)
    val l = pmod(lNcp - r2d(atan2(y, x)), lit(360.0))
    struct(l.as("gl"), r2d(b).as("gb"))
  }

  /** Local mean sidereal time in degrees from MJD(UT) and east longitude
    * (GMST polynomial, `scheduling/sid.pl` semantics). */
  def lstDeg(mjdUt: Column, lonDeg: Column): Column = {
    val d = mjdUt - lit(51544.5) // days since J2000.0
    pmod(lit(280.46061837) + lit(360.98564736629) * d + lonDeg, lit(360.0))
  }

  /** (az, el) degrees from RA/DEC, site latitude and LST — the `azza.pl`
    * spherical-triangle form; az measured from north through east. */
  def azEl(raDeg: Column, decDeg: Column, latDeg: Column, lstDegC: Column): Column = {
    val ha = d2r(pmod(lstDegC - raDeg, lit(360.0)))
    val dec = d2r(decDeg); val lat = d2r(latDeg)
    val sinEl = sin(dec) * sin(lat) + cos(dec) * cos(lat) * cos(ha)
    val el = asin(sinEl)
    val az = atan2(-sin(ha) * cos(dec),
      sin(dec) * cos(lat) - cos(dec) * sin(lat) * cos(ha))
    struct(pmod(r2d(az), lit(360.0)).as("az"), r2d(el).as("el"))
  }

  /** Aeff max-theoretical model (C8, `fluxcal/lofar_gain.py:460-473`):
    * HBA nelem·16·min(λ²/3, 1.5625), LBA nelem·λ²/3; λ = c/f. */
  def aeffMax(isHba: Column, nelem: Column, freqMhz: Column): Column = {
    val lambda = lit(299.792458) / freqMhz // meters (f in MHz)
    val l23 = lambda * lambda / lit(3.0)
    when(isHba, nelem * lit(16.0) * least(l23, lit(1.5625)))
      .otherwise(nelem * l23)
  }

  def sqlAeffMax(isHba: String, nelem: String, f: String): String = {
    val l23 = s"((299.792458 / ($f)) * (299.792458 / ($f)) / 3.0)"
    s"(CASE WHEN $isHba THEN ($nelem) * 16.0 * least($l23, 1.5625) " +
      s"ELSE ($nelem) * $l23 END)"
  }

  // ---------- transit times (C4), `scheduling/azlst.pl:1-245`,
  // `scheduling/bfscheduler.py:277-311` — PORTABLE TIER. The GMST
  // polynomial is multiply-add-mod only (no trig), so LST and all transit
  // arithmetic below pair with the DuckDB oracle bit-for-bit. fmod on
  // doubles is IEEE-exact on both engines; pmod = fmod + conditional add.

  /** LST advance rate, degrees per solar day (sid.pl sidereal rate). */
  val LstRateDegPerDay = 360.98564736629

  /** SQL pmod over doubles matching Spark's pmod exactly — including the
    * SECOND modulo Spark applies on the negative branch ((r + m) % m),
    * which matters when a tiny negative r makes r + m round to exactly m:
    * Spark then returns 0, a bare r + m would return m. */
  def sqlPmod(x: String, m: String): String =
    s"(CASE WHEN fmod($x, $m) < 0 THEN fmod(fmod($x, $m) + $m, $m) ELSE fmod($x, $m) END)"

  // NOTE: the e0 suffix forces DuckDB to read these literals as DOUBLE —
  // its default DECIMAL literals overflow on the sidereal-rate multiply
  // (and would not be bit-identical to Spark's double arithmetic anyway).
  def sqlLstDeg(mjd: String, lon: String): String =
    sqlPmod(s"280.46061837e0 + 360.98564736629e0 * (($mjd) - 51544.5e0) + ($lon)",
      "360.0")

  /** MJD of the last transit (hour angle = 0, i.e. LST == RA) at or before
    * `mjd`: back off by the current hour angle at the LST rate. */
  def previousTransitMjd(mjd: Column, raDeg: Column, lonDeg: Column): Column =
    mjd - pmod(lstDeg(mjd, lonDeg) - raDeg, lit(360.0)) / lit(LstRateDegPerDay)

  def sqlPreviousTransitMjd(mjd: String, ra: String, lon: String): String =
    s"(($mjd) - ${sqlPmod(s"${sqlLstDeg(mjd, lon)} - ($ra)", "360.0")} / 360.98564736629e0)"

  /** MJD of the first transit strictly after the previous one: one
    * sidereal day (360° of LST advance) later. */
  def nextTransitMjd(mjd: Column, raDeg: Column, lonDeg: Column): Column =
    previousTransitMjd(mjd, raDeg, lonDeg) + lit(360.0) / lit(LstRateDegPerDay)

  def sqlNextTransitMjd(mjd: String, ra: String, lon: String): String =
    s"(${sqlPreviousTransitMjd(mjd, ra, lon)} + 360.0e0 / 360.98564736629e0)"

  /** Elevation at transit: 90 − |lat − dec| (azlst.pl EL_transit, the
    * HA=0 case of the zenith-angle formula — reduces to a plain
    * difference, no trig). */
  def transitElevation(decDeg: Column, latDeg: Column): Column =
    lit(90.0) - abs(latDeg - decDeg)

  def sqlTransitElevation(dec: String, lat: String): String =
    s"(90.0 - abs(($lat) - ($dec)))"

  /** Circumpolar at this (lat, el): source never sets
    * (azlst.pl:77-83, with the reference's 0.001° comparison tolerance). */
  def neverSets(decDeg: Column, latDeg: Column, elDeg: Column): Column =
    when(latDeg >= 0.0, decDeg >= lit(90.0) - latDeg + elDeg - 0.001)
      .otherwise(decDeg <= -(lit(90.0) + latDeg + elDeg - 0.001))

  def sqlNeverSets(dec: String, lat: String, el: String): String =
    s"(CASE WHEN ($lat) >= 0.0 THEN ($dec) >= 90.0 - ($lat) + ($el) - 0.001 " +
      s"ELSE ($dec) <= -(90.0 + ($lat) + ($el) - 0.001) END)"

  /** Source never rises above el at this latitude (azlst.pl:84-89). */
  def neverRises(decDeg: Column, latDeg: Column, elDeg: Column): Column =
    when(latDeg >= 0.0, decDeg < -(lit(90.0) - latDeg) + elDeg + 0.001)
      .otherwise(decDeg > lit(90.0) + latDeg - elDeg - 0.001)

  def sqlNeverRises(dec: String, lat: String, el: String): String =
    s"(CASE WHEN ($lat) >= 0.0 THEN ($dec) < -(90.0 - ($lat)) + ($el) + 0.001 " +
      s"ELSE ($dec) > 90.0 + ($lat) - ($el) - 0.001 END)"

  /** Transit-approach distance in minutes for an observing slot
    * [startMjd, endMjd] (bfscheduler.py:285-290): positive when the
    * nearest transit is outside the slot; ≤ tolerance earns the
    * close-to-transit scheduling bonus. */
  def transitApproachMin(startMjd: Column, endMjd: Column,
                         prevTransit: Column, nextTransit: Column): Column = {
    val a1 = lit(1440.0) * (startMjd - prevTransit)
    val a2 = lit(1440.0) * (nextTransit - endMjd)
    when(a1 > 0, when(a2 > 0, least(a1, a2)).otherwise(a1)).otherwise(a2)
  }

  def sqlTransitApproachMin(start: String, end: String,
                            prev: String, next: String): String = {
    val a1 = s"(1440.0 * (($start) - ($prev)))"
    val a2 = s"(1440.0 * (($next) - ($end)))"
    s"(CASE WHEN $a1 > 0 THEN (CASE WHEN $a2 > 0 THEN least($a1, $a2) ELSE $a1 END) ELSE $a2 END)"
  }

  /** The transit an observation should anchor to (bfscheduler.py:302-311):
    * the in-slot next transit, else whichever of previous/next is closer
    * to the slot. */
  def chosenTransitMjd(startMjd: Column, endMjd: Column,
                       prevTransit: Column, nextTransit: Column): Column =
    when(nextTransit >= startMjd && nextTransit <= endMjd, nextTransit)
      .when(startMjd - prevTransit < nextTransit - endMjd, prevTransit)
      .otherwise(nextTransit)

  def sqlChosenTransitMjd(start: String, end: String,
                          prev: String, next: String): String =
    s"(CASE WHEN ($next) >= ($start) AND ($next) <= ($end) THEN ($next) " +
      s"WHEN ($start) - ($prev) < ($next) - ($end) THEN ($prev) ELSE ($next) END)"

  // ---------- MJD ↔ Dublin ↔ UTC helpers (C5) — PORTABLE TIER.
  // Dublin day = JD − 2415020 (`lofar_fluxcal.py:689-691`); minute
  // rounding is round-half-up on the minute grid
  // (`bfscheduler.py:584-595`). MJD 40587 = 1970-01-01 (Unix epoch).

  def mjdToDublin(mjd: Column): Column = mjd - 15019.5
  def dublinToMjd(d: Column): Column = d + 15019.5
  def mjdToUnixSec(mjd: Column): Column = (mjd - 40587.0) * 86400.0
  def unixSecToMjd(sec: Column): Column = sec / 86400.0 + 40587.0
  def mjdRoundToMinute(mjd: Column): Column =
    floor(mjd * 1440.0 + 0.5) / 1440.0
  /** UTC wall-clock timestamp of an MJD instant. */
  def mjdToUtc(mjd: Column): Column = timestamp_seconds(mjdToUnixSec(mjd))

  def sqlMjdToDublin(mjd: String): String = s"(($mjd) - 15019.5)"
  def sqlMjdToUnixSec(mjd: String): String = s"((($mjd) - 40587.0) * 86400.0)"
  def sqlMjdRoundToMinute(mjd: String): String =
    s"(floor(($mjd) * 1440.0 + 0.5) / 1440.0)"

  /** Driver-side double versions for collected-row pipelines. */
  def mjdToUnixSecD(mjd: Double): Double = (mjd - 40587.0) * 86400.0
  def mjdRoundToMinuteD(mjd: Double): Double =
    math.floor(mjd * 1440.0 + 0.5) / 1440.0

  // ---------- transit HA/LST range (C4 trig tier — ScalaTest-verified)

  /** |hour angle| in degrees at which the source crosses elevation el
    * (azlst.pl get_HA): acos((cos ZA − sin δ sin φ)/(cos δ cos φ)). */
  def haAtElevation(elDeg: Column, decDeg: Column, latDeg: Column): Column = {
    val za = d2r(lit(90.0) - elDeg)
    val dec = d2r(decDeg); val lat = d2r(latDeg)
    r2d(acos((cos(za) - sin(dec) * sin(lat)) / (cos(dec) * cos(lat))))
  }

  /** LST (degrees) of rise and set at the elevation whose |HA| is haDeg:
    * RA ∓ HA mod 360 (azlst.pl:110-116, in degrees not hours). */
  def riseSetLst(raDeg: Column, haDeg: Column): Column =
    struct(pmod(raDeg - haDeg, lit(360.0)).as("lst_rise"),
      pmod(raDeg + haDeg, lit(360.0)).as("lst_set"))
}
