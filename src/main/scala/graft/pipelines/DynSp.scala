package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Cube, ProfileOps}
import graft.functions.RobustStats

/** Dynamic-spectrum pipeline — the engine form of `dynsp.py`:
  * per-(subint, chan) on-pulse flux minus off-pulse baseline, Q-Q
  * normalization of the resulting dynamic spectrum (`dynsp.py:185-224`),
  * then the 2-D autocorrelation with zero-lag normalization and the
  * half-power scintillation widths (`dynsp.py:232-251,316-336`).
  *
  * Scale shape: the dynamic spectrum is one row per (subint, chan) —
  * already scrunched, orders of magnitude smaller than the cube — so the
  * lag self-join ACF is a bounded band join (±maxLag on both axes), as
  * SURVEY A22 prescribes; the FFT alternative only becomes interesting
  * when nsubint×nchan approaches shuffle-partition scale.
  */
object DynSp {

  /** On−off dynamic spectrum: per (obs, subint, chan) mean over the
    * detected on-pulse bins minus mean over the off bins, zap-aware. */
  def dynamicSpectrum(cube: Cube, thresholdSigma: Double = 2.5,
                      windowExpandFrac: Double = 0.15): DataFrame = {
    val keys = Seq("obs_id", "pol")
    val profile = ProfileOps.totalProfile(cube)
      .select(col("obs_id"), col("pol"), col("bin"), col("value"))
    val nbins = profile.groupBy(keys.map(col): _*)
      .agg((max(col("bin")) + 1).as("nbin"))
    // left join + coalesce: with no detectable pulse the on-window falls
    // back to the first quarter of phase (a window must always exist for
    // the on−off difference to be defined)
    val islands = ProfileOps.onPulseWindow(profile, thresholdSigma)
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(col("bin_lo"), col("bin_hi")), col("island_flux")).as("w"))
    // NB: greatest/least SKIP nulls, so the null-island case must branch
    // explicitly — greatest(null, 0) is 0, not null
    val win = nbins.join(islands, keys, "left")
      .select(col("obs_id"), col("pol"),
        when(col("w").isNotNull,
          greatest(col("w.bin_lo") - ceil(col("nbin") * windowExpandFrac), lit(0)))
          .otherwise(lit(0)).as("bin_lo"),
        when(col("w").isNotNull,
          least(col("w.bin_hi") + ceil(col("nbin") * windowExpandFrac),
            col("nbin") - 1))
          .otherwise(floor(col("nbin") / 4)).as("bin_hi"))
    ProfileOps.weighted(cube)
      .filter(col("weight") > 0)
      .join(broadcast(win), keys)
      .withColumn("on", col("bin").between(col("bin_lo"), col("bin_hi")))
      .groupBy(col("obs_id"), col("pol"), col("subint"), col("chan"))
      .agg((avg(when(col("on"), col("value"))) -
        avg(when(!col("on"), col("value")))).as("flux"))
  }

  /** Q-Q normalized spectrum: (flux − mean)/rms with the inline
    * osm∈[−1,1] Q-Q estimator variant of `dynsp.py:194-197`. */
  def normalized(dyn: DataFrame): DataFrame = {
    val keys = Seq("obs_id", "pol")
    val stats = dyn.groupBy(keys.map(col): _*)
      .agg(RobustStats.qqStats(col("flux")).as("mr"))
    dyn.join(broadcast(stats), keys)
      // rms == 0 (constant-flux group) → 0, matching the reference's
      // explicit zero branch (dynsp.py:198-200); without the guard the
      // division poisons the downstream ACF sums with null/Infinity.
      .withColumn("norm",
        when(col("mr.rms") > 0.0,
          (col("flux") - col("mr.mean")) / col("mr.rms")).otherwise(0.0))
      .drop("mr")
  }

  /** 2-D ACF over (dt subints, df chans), normalized to the zero-lag
    * value; lag band join bounded by maxLagT/maxLagF. */
  def acf2d(norm: DataFrame, maxLagT: Int, maxLagF: Int): DataFrame = {
    val a = norm.select(col("obs_id"), col("pol"), col("subint"),
      col("chan"), col("norm").as("va"))
    val b = norm.select(col("obs_id"), col("pol"),
      col("subint").as("s2"), col("chan").as("c2"), col("norm").as("vb"))
    val raw = a.join(b, Seq("obs_id", "pol"))
      .withColumn("dt", col("s2") - col("subint"))
      .withColumn("df", col("c2") - col("chan"))
      .filter(abs(col("dt")) <= maxLagT && abs(col("df")) <= maxLagF)
      .groupBy(col("obs_id"), col("pol"), col("dt"), col("df"))
      .agg(sum(col("va") * col("vb")).as("r"), count(lit(1)).as("n_pairs"))
      // triangular bias correction: per-pair count normalization
      .withColumn("r", col("r") / col("n_pairs"))
    val zero = raw.filter(col("dt") === 0 && col("df") === 0)
      .select(col("obs_id"), col("pol"), col("r").as("r0"))
    raw.join(broadcast(zero), Seq("obs_id", "pol"))
      .withColumn("acf", col("r") / col("r0"))
      .select(col("obs_id"), col("pol"), col("dt"), col("df"), col("acf"),
        col("n_pairs"))
  }

  /** Half-power scintillation widths: smallest |df| (at dt=0) and |dt|
    * (at df=0) where the ACF drops below 0.5. */
  def halfPower(acf: DataFrame): DataFrame =
    acf.groupBy(col("obs_id"), col("pol"))
      .agg(
        min(when(col("dt") === 0 && col("df") =!= 0 && col("acf") < 0.5,
          abs(col("df")))).as("hp_df"),
        min(when(col("df") === 0 && col("dt") =!= 0 && col("acf") < 0.5,
          abs(col("dt")))).as("hp_dt"))

  /** Full pipeline: cube → dynamic spectrum → normalize → ACF → widths. */
  def run(cube: Cube, maxLagT: Int = 4, maxLagF: Int = 8): DataFrame = {
    val acf = acf2d(normalized(dynamicSpectrum(cube)), maxLagT, maxLagF)
    halfPower(acf)
  }
}
