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

  test("table-gain model: sefd reads Aeff from the (freq, el) cube") {
    // constant cube → every channel gets exactly that Aeff
    val gain = (for (fi <- 0 to 28; ei <- 0 to 90)
      yield (110.0 + 5.0 * fi, ei.toDouble, 2000.0))
      .toDF("freq", "el", "v")
    val dim = FluxCal.sefdDim(spark, cfg, FluxCal.TableGain(gain, elDeg = 45.3))
    val aeffs = dim.select($"aeff").as[Double].collect()
    assert(aeffs.length == cfg.nchan)
    aeffs.foreach(a => assert(math.abs(a - 2000.0) < 1e-9))
  }

  test("hamaker_carozzi model divides max Aeff by the nearest-frequency factor") {
    val bcRows = Seq((110.0, 2.0), (150.0, 4.0), (250.0, 8.0))
    val bc = bcRows.toDF("freq", "factor")
    val base = FluxCal.sefdDim(spark, cfg)
      .select($"chan", $"freq", $"aeff").as[(Int, Double, Double)].collect()
    val hc = FluxCal.sefdDim(spark, cfg, FluxCal.HamakerCarozzi(bc))
      .select($"chan", $"aeff").as[(Int, Double)].collect().toMap
    base.foreach { case (chan, freq, aeffMaxV) =>
      val factor = bcRows.minBy { case (f, _) => math.abs(freq - f) }._2
      assert(math.abs(hc(chan) - aeffMaxV / factor) < 1e-9,
        s"chan $chan freq $freq")
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
