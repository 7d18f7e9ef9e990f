package graft.pipelines

import graft.SparkSpecBase
import graft.operators.CubeFixture
import org.apache.spark.sql.functions._

class DynSpSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val cube = CubeFixture.build(spark, CubeFixture.Spec(pulseAmp = 3.0))
  private lazy val acf = DynSp.acf2d(
    DynSp.normalized(DynSp.dynamicSpectrum(cube)), maxLagT = 4, maxLagF = 8).cache()

  test("dynamic spectrum has one row per unzapped (subint, chan)") {
    val dyn = DynSp.dynamicSpectrum(cube)
    val spec = CubeFixture.Spec()
    assert(dyn.count() == spec.nsubint * spec.nchan - spec.zapped.size)
  }

  test("ACF is 1 at zero lag, bounded, and symmetric under lag negation") {
    val zero = acf.filter($"dt" === 0 && $"df" === 0)
      .select($"acf").as[Double].head()
    assert(math.abs(zero - 1.0) < 1e-12)
    val rows = acf.select($"dt", $"df", $"acf")
      .as[(Int, Int, Double)].collect()
    val byLag = rows.map { case (dt, df, v) => (dt, df) -> v }.toMap
    rows.foreach { case (dt, df, v) =>
      assert(math.abs(v) <= 1.0 + 1e-9, s"|acf($dt,$df)| > 1: $v")
      // r(dt,df) uses exactly the pairs of r(-dt,-df) with roles swapped
      assert(math.abs(v - byLag((-dt, -df))) < 1e-12,
        s"asymmetric at ($dt,$df)")
    }
  }

  test("white-noise dynamic spectrum decorrelates at one lag (half-power widths)") {
    // pulseAmp=0: on-off flux is pure noise → ACF is a delta at 0 lag
    val noise = CubeFixture.build(spark,
      CubeFixture.Spec(pulseAmp = 0.0, seed = 99L))
    // no detectable pulse → use the full-profile fallback window check:
    // onPulseWindow may find a spurious tiny island; the ACF widths are
    // what matters
    val hp = DynSp.run(noise)
      .select($"hp_df", $"hp_dt").as[(Option[Int], Option[Int])].head()
    assert(hp._1.contains(1), s"white noise should halve at df=1, got $hp")
    assert(hp._2.contains(1), s"white noise should halve at dt=1, got $hp")
  }
}
