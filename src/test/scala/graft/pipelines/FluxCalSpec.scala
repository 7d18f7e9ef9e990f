package graft.pipelines

import graft.SparkSpecBase
import graft.operators.CubeFixture
import org.apache.spark.sql.functions._

class FluxCalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val spec = CubeFixture.Spec(dm = 30.0, pulseAmp = 30.0,
    nchan = 16, nbin = 128, f0Mhz = 110.0, chanBwMhz = 5.0)
  private lazy val cfg = FluxCal.Config(dm = spec.dm, f0Mhz = spec.f0Mhz,
    chanBwMhz = spec.chanBwMhz, nchan = spec.nchan, nbins = spec.nbin,
    tbinSec = spec.tbinSec, tsubSec = 10.0)
  private lazy val result = FluxCal.run(spark,
    CubeFixture.build(spark, spec), CubeFixture.durations(spark, spec), cfg)

  test("sefd dimension is physical: positive, band-shaped") {
    val dim = FluxCal.sefdDim(spark, cfg)
    assert(dim.count() == cfg.nchan)
    val rows = dim.select($"chan", $"tsys", $"aeff", $"sefd")
      .as[(Int, Double, Double, Double)].collect()
    rows.foreach { case (c, tsys, aeff, sefd) =>
      assert(tsys > 0 && aeff > 0 && sefd > 0, s"chan $c: $tsys $aeff $sefd")
    }
  }

  test("report has one row per (subint, chan) with finite flux") {
    val n = result.report.count()
    assert(n == spec.nsubint * spec.nchan)
    val bad = result.report
      .filter(isnan($"mean_flux") || $"mean_flux".isNull).count()
    assert(bad == 0)
  }

  test("calibrated total profile peaks at the dedispersed pulse bin") {
    val peakBin = result.stats.select($"peak_bin").as[Int].head()
    assert(peakBin == spec.pulseBin, s"peak at $peakBin != ${spec.pulseBin}")
  }

  test("pulse significance is strong after calibration") {
    val (peak, mean, rms) = result.stats
      .select($"peak", $"mean", $"rms").as[(Double, Double, Double)].head()
    assert((peak - mean) / rms > 5.0, s"S/N = ${(peak - mean) / rms}")
  }

  test("rfi fraction reflects the zapped fixture cells") {
    val frac = result.rfi.select($"rfi_frac").as[Double].head()
    val expected = spec.zapped.size.toDouble / (spec.nsubint * spec.nchan)
    assert(math.abs(frac - expected) < 1e-12)
  }

  test("spectrum re-bins channels by the configured factor") {
    val nOut = result.spectrum.select(countDistinct($"outch")).as[Long].head()
    assert(nOut == cfg.nchan / cfg.specRebin)
  }
}
