package graft.pipelines

import graft.SparkSpecBase
import graft.operators.CubeFixture

/** The reference's own verification surface for S/N is a side-by-side
  * method comparison (`fluxcal/snr.py:379-410`) — methods must roughly
  * agree on the same data. Reproduce that check on the synthetic cube.
  */
class SnrSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val rows = {
    // moderate pulse: the reference's method comparison operates on
    // low-S/N per-channel profiles, not saturated detections
    val cube = CubeFixture.build(spark, CubeFixture.Spec(pulseAmp = 1.5))
    Snr.compare(cube)
      .select($"method", $"mean", $"rms", $"snr_peak", $"prof_significance")
      .as[(String, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
  }

  test("all three baseline methods produce a detection on the injected pulse") {
    assert(rows.keySet == Set("qq", "off", "poly"))
    rows.values.foreach { case (m, _, rms, snrPeak, sig) =>
      assert(rms > 0, s"$m rms must be positive")
      assert(snrPeak > 5, s"$m failed to detect the amp-12 pulse: snr=$snrPeak")
      assert(sig > 3, s"$m profile significance too low: $sig")
    }
  }

  test("methods agree within cross-check tolerances (snr.py's own oracle)") {
    val (_, _, rmsQq, peakQq, _) = ("", 0.0, rows("qq")._3, rows("qq")._4, 0.0)
    val rmsVals = rows.values.map(_._3)
    val peakVals = rows.values.map(_._4)
    // rms estimates of the same noise floor within 35% of each other
    assert(rmsVals.max / rmsVals.min < 1.35,
      s"rms disagreement: $rows")
    // peak S/N within 40% across methods
    assert(peakVals.max / peakVals.min < 1.40,
      s"snr_peak disagreement: $rows")
    // means are baseline-level: far below the pulse peak in rms units
    rows.values.foreach { case (m, mean, rms, _, _) =>
      assert(math.abs(mean) < 5 * rms, s"$m mean is not baseline-level")
    }
    assert(rmsQq > 0 && peakQq > 0)
  }
}
