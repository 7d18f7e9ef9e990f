package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val spec = CubeFixture.Spec()
  private lazy val cube = {
    val c = CubeFixture.build(spark, spec)
    Cube(c.samples.cache(), c.weights.cache())
  }

  private def samplesMap(c: Cube): Map[(Int, Int, Int, Int), Double] =
    c.samples.select($"subint", $"pol", $"chan", $"bin", $"value")
      .as[(Int, Int, Int, Int, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap

  test("tscrunch composition: k=2 twice equals k=4 once") {
    val a = samplesMap(ProfileOps.tscrunch(ProfileOps.tscrunch(cube, 2), 2))
    val b = samplesMap(ProfileOps.tscrunch(cube, 4))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9, s"at $k") }
  }

  test("tscrunch to one subint preserves the weighted mean exactly") {
    val one = ProfileOps.tscrunch(cube, spec.nsubint)
    assert(one.samples.select(countDistinct($"subint")).as[Long].head() == 1)
    // manual check on a single (chan, bin) cell
    val chan = 2; val bin = 5
    val w = cube.weights.filter($"chan" === chan)
      .select($"subint", $"weight").as[(Int, Double)].collect().toMap
    val vs = cube.samples.filter($"chan" === chan && $"bin" === bin)
      .select($"subint", $"value").as[(Int, Double)].collect()
    val expected = vs.map { case (s, v) => v * w(s) }.sum / vs.map(r => w(r._1)).sum
    val got = one.samples.filter($"chan" === chan && $"bin" === bin)
      .select($"value").as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
  }

  test("fscrunch halves the channel count and respects zap weights") {
    val f = ProfileOps.fscrunch(cube, 2)
    assert(f.samples.select(countDistinct($"chan")).as[Long].head() == spec.nchan / 2)
    // zapped cell (subint 0, chan 3): output chan 1 of subint 0 must use
    // only chan 2's values
    val got = f.samples.filter($"subint" === 0 && $"chan" === 1 && $"bin" === 7)
      .select($"value").as[Double].head()
    val only = cube.samples.filter($"subint" === 0 && $"chan" === 2 && $"bin" === 7)
      .select($"value").as[Double].head()
    assert(math.abs(got - only) < 1e-9, "zapped channel leaked into fscrunch")
  }

  test("bscrunch halves bins and preserves the total sum scaled by k") {
    val b = ProfileOps.bscrunch(cube, 2)
    assert(b.samples.select(max($"bin")).as[Int].head() == spec.nbin / 2 - 1)
    val sumBefore = cube.samples.agg(sum($"value")).as[Double].head()
    val sumAfter = b.samples.agg(sum($"value")).as[Double].head()
    assert(math.abs(sumAfter * 2 - sumBefore) < 1e-6)
  }

  test("rotate round trip is the identity") {
    val r = ProfileOps.rotate(ProfileOps.rotate(cube, 37, spec.nbin),
      spec.nbin - 37, spec.nbin)
    val a = samplesMap(r); val b = samplesMap(cube)
    assert(a == b)
  }

  test("rotate moves the peak by the shift amount") {
    val prof = ProfileOps.totalProfile(cube)
    def peakBin(p: org.apache.spark.sql.DataFrame): Int =
      p.orderBy($"value".desc).select($"bin").as[Int].head()
    val p0 = peakBin(prof)
    val p1 = peakBin(ProfileOps.totalProfile(ProfileOps.rotate(cube, 10, spec.nbin)))
    assert(p1 == (p0 + 10) % spec.nbin)
  }

  test("dedisperse aligns a dispersed pulse across channels") {
    val dispSpec = spec.copy(dm = 30.0, pulseAmp = 40.0, seed = 99L)
    val disp = CubeFixture.build(spark, dispSpec)
    // before: per-channel peak bins differ (drift injected)
    def peakByChan(c: Cube): Map[Int, Int] =
      c.samples.groupBy($"chan")
        .agg(max_by($"bin", $"value").as("pk"))
        .as[(Int, Int)].collect().toMap
    val before = peakByChan(ProfileOps.tscrunch(disp, dispSpec.nsubint))
    assert(before.values.toSet.size > 1, "fixture failed to inject drift")
    val fRef = dispSpec.f0Mhz + dispSpec.nchan * dispSpec.chanBwMhz
    val dedis = ProfileOps.dedisperse(disp, dispSpec.dm, dispSpec.f0Mhz,
      dispSpec.chanBwMhz, fRef, dispSpec.tbinSec, dispSpec.nbin)
    val after = peakByChan(ProfileOps.tscrunch(dedis, dispSpec.nsubint))
    assert(after.values.toSet.size == 1, s"misaligned: $after")
    assert(after.values.head == dispSpec.pulseBin)
  }

  test("normalizeWeights caps the max weight at 1 and keeps zaps at 0") {
    val n = ProfileOps.normalizeWeights(cube, CubeFixture.durations(spark, spec))
    val mx = n.weights.agg(max($"weight")).as[Double].head()
    assert(math.abs(mx - 1.0) < 1e-12)
    val zapped = n.weights.filter($"subint" === 0 && $"chan" === 3)
      .select($"weight").as[Double].head()
    assert(zapped == 0.0)
  }

  test("rfiFraction counts the zapped cells") {
    val frac = ProfileOps.rfiFraction(cube).select($"rfi_frac").as[Double].head()
    val expected = spec.zapped.size.toDouble / (spec.nsubint * spec.nchan)
    assert(math.abs(frac - expected) < 1e-12)
  }

  test("qqNormalize brings off-pulse cells to ~N(0,1)") {
    val n = ProfileOps.qqNormalize(cube)
    // off-pulse bins far from the injected pulse
    val off = n.samples.filter($"bin" > 80 && $"bin" < 120)
    val (m, s) = off.agg(avg($"value"), stddev_pop($"value"))
      .as[(Double, Double)].head()
    assert(math.abs(m) < 0.15, s"off-pulse mean $m")
    assert(math.abs(s - 1.0) < 0.15, s"off-pulse std $s")
  }

  test("totalProfile excludes zapped cells") {
    val t = ProfileOps.totalProfile(cube)
    val nCells = t.select($"n_cells").distinct().as[Long].collect()
    val expected = spec.nsubint * spec.nchan - spec.zapped.size
    assert(nCells.toSeq == Seq(expected.toLong))
  }

  test("profileStats finds the injected pulse") {
    val stats = ProfileOps.profileStats(ProfileOps.totalProfile(cube), spec.nbin)
    val (peakBin, weff) = stats.select($"peak_bin", $"weff")
      .as[(Int, Double)].head()
    assert(peakBin == spec.pulseBin)
    assert(weff > 0 && weff < spec.nbin)
  }

  test("onPulseWindow isolates the island around the pulse") {
    val islands = ProfileOps.onPulseWindow(ProfileOps.totalProfile(cube))
      .select($"bin_lo", $"bin_hi", $"width").as[(Int, Int, Long)].collect()
    assert(islands.nonEmpty)
    val main = islands.maxBy(_._3)
    assert(main._1 <= spec.pulseBin && spec.pulseBin <= main._2)
  }

  test("periodDouble (R3) appends a one-period-shifted copy") {
    val samples = Seq(("L1", 0, 0, 0, 0, 1.0), ("L1", 0, 0, 0, 1, 2.0))
      .toDF("obs_id", "subint", "pol", "chan", "bin", "value")
    val weights = Seq(("L1", 0, 0, 1.0)).toDF("obs_id", "subint", "chan", "weight")
    val doubled = ProfileOps.periodDouble(Cube(samples, weights), nbins = 2)
    val got = doubled.samples.orderBy($"bin")
      .select($"bin", $"value").as[(Int, Double)].collect().toSeq
    assert(got == Seq((0, 1.0), (1, 2.0), (2, 1.0), (3, 2.0)))
  }

  test("cleanFinite (F9) zeroes NaN and infinities, keeps finite values") {
    val samples = Seq(
      ("L1", 0, 0, 0, 0, 1.5), ("L1", 0, 0, 0, 1, Double.NaN),
      ("L1", 0, 0, 0, 2, Double.PositiveInfinity),
      ("L1", 0, 0, 0, 3, Double.NegativeInfinity))
      .toDF("obs_id", "subint", "pol", "chan", "bin", "value")
    val weights = Seq(("L1", 0, 0, 1.0)).toDF("obs_id", "subint", "chan", "weight")
    val cleaned = ProfileOps.cleanFinite(Cube(samples, weights))
    val got = cleaned.samples.orderBy($"bin").select($"value").as[Double].collect()
    assert(got.toSeq == Seq(1.5, 0.0, 0.0, 0.0))
  }

  test("autoOffWindow (W4) rotates the pulse window to bin 0") {
    val nbins = 64
    // flat noise floor at 0 with a block pulse at bins 30..33
    val rows = (0 until nbins).map { b =>
      ("L1", 0, b, if (b >= 30 && b <= 33) 10.0 else 0.0)
    }
    val profile = rows.toDF("obs_id", "pol", "bin", "value")
    val (rotated, bounds) = ProfileOps.autoOffWindow(profile, nbins)
    val (rot, offLo, offHi) = bounds
      .select($"rot_bins", $"off_lo", $"off_hi")
      .as[(Int, Int, Int)].head()
    // island 30..33 (width 3), 15% margin → le = 30, re = 34
    assert(rot == 30 && offLo == 4 && offHi == nbins)
    val rotVals = rotated.orderBy($"bin")
      .select($"bin", $"value").as[(Int, Double)].collect().toMap
    // pulse now occupies bins 0..3; everything from off_lo on is baseline
    (0 to 3).foreach(b => assert(rotVals(b) == 10.0, s"bin $b"))
    (offLo until nbins).foreach(b => assert(rotVals(b) == 0.0, s"bin $b"))
  }

  test("autoOffWindow keeps windowless (flat) profiles with zero rotation") {
    val nbins = 16
    val flat = (0 until nbins).map(b => ("F1", 0, b, 1.0))
      .toDF("obs_id", "pol", "bin", "value")
    val (rotated, bounds) = ProfileOps.autoOffWindow(flat, nbins)
    // no bin exceeds mean + 2.5σ on a constant profile → reference's
    // no-signal branch: rotation 0, whole profile is off-pulse
    assert(rotated.count() == nbins)
    val (rot, offLo, offHi) = bounds
      .select($"rot_bins", $"off_lo", $"off_hi").as[(Int, Int, Int)].head()
    assert(rot == 0 && offLo == 0 && offHi == nbins)
  }

  test("fold recovers the phase of a periodic signal and is partition-stable") {
    val period = 0.7; val n = 20000; val t0 = 5.0
    val ts = (0 until n).map { i =>
      val t = i * 0.001
      val phase = ((t - t0) / period) % 1.0
      val ph = if (phase < 0) phase + 1 else phase
      val v = if (ph > 0.48 && ph < 0.52) 10.0 else 0.0
      (t, v)
    }.toDF("t", "v")
    def run(parts: Int) =
      ProfileOps.fold(ts.repartition(parts), "t", "v", t0, period, 50)
        .orderBy($"ibin").select($"ibin", $"total").as[(Int, Double)].collect().toSeq
    val a = run(1); val b = run(6)
    assert(a == b, "fold depends on partitioning")
    val peak = a.maxBy(_._2)._1
    assert(peak == 24 || peak == 25, s"folded peak at $peak")
  }
}
