package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import graft.functions.AstroFunctions._

class AstroFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.cast("double")).as[Double].head()

  test("tinst HBA polynomial matches direct power-sum evaluation") {
    // independent evaluation: plain power sum (the reference's loop form,
    // `fluxcal/lofar_tinst.py:79-80`) vs the engine's Horner form
    for (f <- Seq(110.0, 150.0, 188.0, 250.0)) {
      val deg = TinstHbaCoeffs.size - 1
      val expected = TinstHbaCoeffs.zipWithIndex
        .map { case (c, i) => c * math.pow(f, deg - i) }.sum
      assert(math.abs(one(tinstHba(lit(f))) - expected) / math.abs(expected) < 1e-10)
    }
  }

  test("tinst is physically plausible (tens to hundreds of K in band)") {
    val t151 = one(tinstHba(lit(151.0)))
    assert(t151 > 50 && t151 < 1000, s"Tinst(151 MHz) = $t151 K")
  }

  test("dispersion delay: two-frequency form is consistent with in-band form") {
    // for a narrow band the pair delay ≈ band smear at center frequency
    val dm = 50.0; val f = 150.0; val band = 0.1
    val pair = one(dispersionPairMs(lit(dm), lit(f - band / 2), lit(f + band / 2)))
    val smear = one(dispersionDelayMs(lit(dm), lit(band), lit(f)))
    assert(math.abs(pair - smear) / smear < 1e-3)
  }

  test("dispersion delay scales linearly with DM and ~f^-3 in band") {
    val d1 = one(dispersionDelayMs(lit(10.0), lit(1.0), lit(150.0)))
    val d2 = one(dispersionDelayMs(lit(20.0), lit(1.0), lit(150.0)))
    assert(math.abs(d2 / d1 - 2.0) < 1e-12)
    val dLow = one(dispersionDelayMs(lit(10.0), lit(1.0), lit(75.0)))
    assert(math.abs(dLow / d1 - 8.0) < 1e-12)
  }

  test("pulsar physics: Crab-like values (P=0.0333 s, Pdot=4.21e-13)") {
    val p = lit(0.0333); val pd15 = lit(421.0) // Pdot/1e-15
    val age = one(charAgeMyr(p, pd15)) * 1e6 // yr
    assert(age > 1000 && age < 2000, s"char age $age yr") // ~1.25 kyr
    val b = one(bSurf(p, pd15))
    assert(b > 1e12 && b < 1e13, s"B_surf $b G") // ~3.8e12 G
    val e = one(edot(p, pd15))
    assert(e > 1e38 && e < 1e39, s"Edot $e erg/s") // ~4.5e38
  }

  test("sexagesimal: RA/DEC round-trip known values") {
    val ra = one(raToDeg(lit("05:34:31.9"))) // Crab
    assert(math.abs(ra - 83.6329166) < 1e-4)
    val dec = one(decToDeg(lit("+22:00:52.1")))
    assert(math.abs(dec - 22.0144722) < 1e-4)
    val decNeg = one(decToDeg(lit("-08:12:30")))
    assert(math.abs(decNeg - (-8.2083333)) < 1e-4)
  }

  test("eqToGal: Crab nebula lands at published galactic coordinates") {
    val g = spark.range(1)
      .select(eqToGal(lit(83.6332083), lit(22.0144722)).as("g"))
      .select($"g.gl", $"g.gb").as[(Double, Double)].head()
    assert(math.abs(g._1 - 184.5575) < 0.01, s"gl = ${g._1}")
    assert(math.abs(g._2 - (-5.7843)) < 0.01, s"gb = ${g._2}")
  }

  test("eqToGal: north galactic pole maps to b=90") {
    val g = spark.range(1)
      .select(eqToGal(lit(192.85948), lit(27.12825)).as("g"))
      .select($"g.gb").as[Double].head()
    assert(math.abs(g - 90.0) < 1e-6)
  }

  test("azEl invariants: transit elevation and pole direction") {
    // source at dec == lat transiting (lst == ra) passes through zenith
    val zen = spark.range(1)
      .select(azEl(lit(100.0), lit(52.9), lit(52.9), lit(100.0)).as("a"))
      .select($"a.el").as[Double].head()
    assert(math.abs(zen - 90.0) < 1e-6)
    // the celestial pole sits at az=0 (north), el=latitude
    val pole = spark.range(1)
      .select(azEl(lit(0.0), lit(90.0), lit(52.9), lit(123.4)).as("a"))
      .select($"a.az", $"a.el").as[(Double, Double)].head()
    assert(math.abs(pole._2 - 52.9) < 1e-6)
    assert(math.abs(pole._1) < 1e-6 || math.abs(pole._1 - 360.0) < 1e-6)
  }

  test("lstDeg: GMST at J2000 epoch and 24h periodicity") {
    assert(math.abs(one(lstDeg(lit(51544.5), lit(0.0))) - 280.46061837) < 1e-6)
    // one sidereal-rate day later the angle advances 360.98564736629 mod 360
    val a = one(lstDeg(lit(58849.0), lit(0.0)))
    val b = one(lstDeg(lit(58850.0), lit(0.0)))
    assert(math.abs((b - a + 720) % 360 - 0.98564736629) < 1e-6)
  }

  test("aeffMax: HBA caps at dipole area above 100 MHz, LBA scales as lambda^2") {
    // HBA at low freq hits the 1.5625 m^2 cap per element
    val hbaLow = one(aeffMax(lit(true), lit(24.0 * 16), lit(110.0)))
    val hbaHigh = one(aeffMax(lit(true), lit(24.0 * 16), lit(240.0)))
    assert(hbaLow > hbaHigh) // area shrinks with frequency once uncapped
    val lba60 = one(aeffMax(lit(false), lit(96.0), lit(60.0)))
    val lba30 = one(aeffMax(lit(false), lit(96.0), lit(30.0)))
    assert(math.abs(lba30 / lba60 - 4.0) < 1e-9) // lambda^2 scaling
  }

  test("transit times: LST equals RA at the computed transit, spacing is one sidereal day") {
    val lon = 6.869883
    for ((mjd, ra) <- Seq((56000.25, 83.633), (56123.7, 0.0), (58849.1, 350.0))) {
      val prev = one(previousTransitMjd(lit(mjd), lit(ra), lit(lon)))
      val next = one(nextTransitMjd(lit(mjd), lit(ra), lit(lon)))
      assert(prev <= mjd && next > mjd)
      // at transit the local sidereal angle IS the source RA
      val lstAtPrev = one(lstDeg(lit(prev), lit(lon)))
      assert(math.abs((lstAtPrev - ra + 540) % 360 - 180) < 1e-6,
        s"LST at transit $lstAtPrev != RA $ra")
      assert(math.abs((next - prev) - 360.0 / 360.98564736629) < 1e-9)
    }
  }

  test("circumpolar flags and transit elevation match azlst.pl at LOFAR") {
    val lat = 52.915111
    // dec 89° never sets at EL=30 (dec >= 90 - lat + el); dec -60 never rises
    assert(one(neverSets(lit(89.0), lit(lat), lit(30.0)).cast("double")) == 1.0)
    assert(one(neverSets(lit(40.0), lit(lat), lit(30.0)).cast("double")) == 0.0)
    assert(one(neverRises(lit(-60.0), lit(lat), lit(30.0)).cast("double")) == 1.0)
    assert(one(neverRises(lit(10.0), lit(lat), lit(30.0)).cast("double")) == 0.0)
    // transit EL of a source at dec = lat passes through zenith
    assert(one(transitElevation(lit(lat), lit(lat))) == 90.0)
  }

  test("HA at elevation: zero at transit elevation, 90 deg for equatorial source on the equator") {
    // a source observed from the equator at dec=0 rises at HA = -90°
    assert(math.abs(one(haAtElevation(lit(0.0), lit(0.0), lit(0.0))) - 90.0) < 1e-9)
    // at the transit elevation itself the HA window closes to 0
    val lat = 52.915111; val dec = 20.0
    val elT = 90.0 - math.abs(lat - dec)
    assert(math.abs(one(haAtElevation(lit(elT), lit(dec), lit(lat)))) < 1e-4)
    // rise/set LSTs straddle the RA symmetrically
    val rs = spark.range(1)
      .select(riseSetLst(lit(100.0), lit(30.0)).as("rs"))
      .select(col("rs.lst_rise"), col("rs.lst_set"))
      .as[(Double, Double)].head()
    assert(rs == ((70.0, 130.0)))
  }

  test("transit approach minutes follow the bfscheduler branch structure") {
    val s = 56000.25; val e = 56000.5
    // transit inside the slot: both a1>0? no — prev <= start & next >= end
    // case A: prev before start, next after end → approach = min side > 0
    val a = one(transitApproachMin(lit(s), lit(e), lit(s - 0.01), lit(e + 0.02)))
    assert(math.abs(a - 1440.0 * 0.01) < 1e-6)
    // case B: next transit inside slot → a1>0, a2<0 → approach = a1
    val b = one(transitApproachMin(lit(s), lit(e), lit(s - 0.03), lit(e - 0.1)))
    assert(math.abs(b - 1440.0 * 0.03) < 1e-6)
    // case C: prev after start (in-slot) → approach = 1440*(next-end) < 0
    val c = one(transitApproachMin(lit(s), lit(e), lit(s + 0.05), lit(e + 0.04)))
    assert(math.abs(c - 1440.0 * 0.04) < 1e-6)
    // anchor transit: in-slot next wins, else nearest side
    assert(one(chosenTransitMjd(lit(s), lit(e), lit(s - 0.03), lit(e - 0.1))) == e - 0.1)
    assert(one(chosenTransitMjd(lit(s), lit(e), lit(s - 0.01), lit(e + 0.5))) == s - 0.01)
  }

  test("MJD/Dublin/UTC helpers: epoch identities and minute rounding") {
    // Dublin day 0 = JD 2415020 = MJD 15019.5 (`lofar_fluxcal.py:689`)
    assert(one(mjdToDublin(lit(15019.5))) == 0.0)
    assert(one(dublinToMjd(mjdToDublin(lit(56001.25)))) == 56001.25)
    // Unix epoch: MJD 40587 = 1970-01-01T00:00
    assert(one(mjdToUnixSec(lit(40587.0))) == 0.0)
    assert(one(unixSecToMjd(mjdToUnixSec(lit(56000.5)))) == 56000.5)
    // J2000: 2000-01-01T12:00 UTC = 946728000 unix sec
    assert(one(mjdToUnixSec(lit(51544.5))) == 946728000.0)
    val ts = spark.range(1)
      .select(date_format(mjdToUtc(lit(51544.5)), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(ts == "2000-01-01 12:00:00")
    // round-half-up to the minute grid (`bfscheduler.py:584-595`)
    val halfMin = 0.5 / 1440.0
    assert(one(mjdRoundToMinute(lit(56000.0) + lit(halfMin) * 0.999)) == 56000.0)
    assert(one(mjdRoundToMinute(lit(56000.0) + lit(halfMin) * 1.001)) ==
      56000.0 + 1.0 / 1440.0)
    assert(mjdToUnixSecD(40587.0) == 0.0)
    assert(mjdRoundToMinuteD(56000.0 + halfMin * 1.001) == 56000.0 + 1.0 / 1440.0)
  }

  test("haslam grid bucketing matches the reference index arithmetic") {
    // `fluxcal/tsky.py:1052-1056`: b = int(gb+90.5) clamped, l = int(gl+0.5)//4
    val df = Seq((0.0, 0.0), (359.9, 89.6), (123.4, -90.0), (47.9, 12.3))
      .toDF("gl", "gb")
      .select(haslamL(col("gl")), haslamB(col("gb")))
      .as[(Int, Int)].collect()
    assert(df.toSeq == Seq((0, 90), (0, 179), (30, 0), (12, 102)))
  }
}
