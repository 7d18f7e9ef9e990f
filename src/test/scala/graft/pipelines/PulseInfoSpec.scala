package graft.pipelines

import graft.SparkSpecBase
import graft.operators.Cube

class PulseInfoSpec extends SparkSpecBase {
  import spark.implicits._

  // one pulse: 8 chans × 32 bins, block pulse of amplitude 5 at
  // bins 10..12 in chans 2..4, zero elsewhere, all weights 1
  private lazy val cube: Cube = {
    val samples = (for {
      chan <- 0 until 8; bin <- 0 until 32
    } yield ("P1", 0, 0, chan, bin,
      if (bin >= 10 && bin <= 12 && chan >= 2 && chan <= 4) 5.0 else 0.0))
      .toDF("obs_id", "subint", "pol", "chan", "bin", "value")
    val weights = (0 until 8).map(ch => ("P1", 0, ch, 1.0))
      .toDF("obs_id", "subint", "chan", "weight")
    Cube(samples, weights)
  }

  test("best boxcar finds the matched width and offset") {
    val (best, _) = PulseInfo.run(cube, threshold = 10.0, nbins = 32, widths = Seq(2, 3, 4))
    val row = best.select($"width", $"toffset", $"aver_prof_snr", $"peak_prof_snr")
      .as[(Int, Int, Double, Double)].head()
    // profile value 15 at bins 10..12: width 3 at offset 10 scores
    // 45/sqrt(3) ≈ 25.98, beating width 2 (21.2) and width 4 (22.5)
    assert(row._1 == 3 && row._2 == 10)
    assert(math.abs(row._3 - 45.0 / math.sqrt(3.0)) < 1e-9)
    assert(row._4 == 15.0)
  }

  test("spectrum islands sessionize the emission channels (W2)") {
    val (_, islands) = PulseInfo.run(cube, threshold = 10.0, nbins = 32, widths = Seq(2, 3, 4))
    val got = islands.select($"foffset", $"fwidth", $"aver_snr")
      .as[(Int, Long, Double)].collect().toSeq
    // chans 2..4 each sum 15 over the window; island = one patch,
    // aver = 45 / (width 3 × fwidth 3) = 5
    assert(got == Seq((2, 3L, 5.0)))
  }

  test("a pulse straddling the phase wrap is found by the circular boxcar") {
    val samples = (for {
      chan <- 0 until 4; bin <- 0 until 32
    } yield ("P3", 0, 0, chan, bin,
      if (bin == 30 || bin == 31 || bin == 0) 5.0 else 0.0))
      .toDF("obs_id", "subint", "pol", "chan", "bin", "value")
    val weights = (0 until 4).map(ch => ("P3", 0, ch, 1.0))
      .toDF("obs_id", "subint", "chan", "weight")
    val (best, _) = PulseInfo.run(Cube(samples, weights),
      threshold = 10.0, nbins = 32, widths = Seq(2, 3, 4))
    val row = best.select($"width", $"toffset").as[(Int, Int)].head()
    // profile value 20 at bins 30, 31, 0 — the wrap window (3, 30) must
    // beat any truncated non-wrapping candidate
    assert(row == ((3, 30)), s"got $row")
  }

  test("two separated emission patches yield two islands") {
    val samples = (for {
      chan <- 0 until 8; bin <- 0 until 32
    } yield ("P2", 0, 0, chan, bin,
      if (bin >= 10 && bin <= 12 && (chan == 1 || chan == 5 || chan == 6)) 5.0
      else 0.0))
      .toDF("obs_id", "subint", "pol", "chan", "bin", "value")
    val weights = (0 until 8).map(ch => ("P2", 0, ch, 1.0))
      .toDF("obs_id", "subint", "chan", "weight")
    val (_, islands) = PulseInfo.run(Cube(samples, weights),
      threshold = 10.0, nbins = 32, widths = Seq(2, 3, 4))
    val got = islands.orderBy($"foffset").select($"foffset", $"fwidth")
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 1L), (5, 2L)))
  }
}
