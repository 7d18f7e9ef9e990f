package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Cube, ProfileOps}
import graft.functions.RobustStats

/** Multi-method S/N pipeline — the engine form of `fluxcal/snr.py`:
  * compute the total profile, find the on-pulse window automatically,
  * then estimate (mean, rms) of the off-pulse baseline with THREE
  * independent methods and derive S/N figures from each:
  *
  *  - "qq":   Q-Q robust fit (probplot + restricted linear fit,
  *            `snr.py:56-67`) via the [[RobustStats.qqStats]] Aggregator;
  *  - "off":  plain mean/std over the off-window bins (`snr.py:263-297`
  *            psrstat analog, natively);
  *  - "poly": polynomial-baseline fit — rms of residuals, mean of the
  *            residuals plus the lowest-20% baseline (`snr.py` Polynom
  *            method / `lofar_fluxcal.py:221-231`).
  *
  * The reference prints the methods side by side as its own sanity check
  * (`snr.py:379-410`) — the closest thing to an oracle in the repo; the
  * engine exposes the same comparison as a DataFrame (one row per
  * (obs_id, pol, method)) and SnrSpec asserts the cross-method
  * agreement on a synthetic cube.
  *
  * Scale shape: the profile is one row per (obs, pol, bin) — tiny after
  * cube aggregation; every per-group estimator is a bounded-buffer
  * Aggregator or window over ≤ nbin rows, grouped by (obs_id, pol), so
  * thousands of observations process in parallel with one shuffle.
  */
object Snr {

  /** One row per (obs_id, pol, method): baseline estimate + S/N block.
    * `windowExpandFrac` widens the detected on-pulse island by that
    * fraction of the ISLAND WIDTH on each side before the off-window
    * stats — the reference's 15% extra-caution margin (`snr.py:126-128`,
    * `le = abins[0] - int(0.15*exclsize)`) that keeps pulse wings out of
    * the baseline. */
  def compare(cube: Cube, thresholdSigma: Double = 2.5,
              polyDegree: Int = 3,
              windowExpandFrac: Double = 0.15): DataFrame = {
    val profile = ProfileOps.totalProfile(cube)
      .select(col("obs_id"), col("pol"), col("bin"), col("value"))
      .cache()
    val keys = Seq("obs_id", "pol")

    val nbins = profile.groupBy(keys.map(col): _*)
      .agg((max(col("bin")) + 1).as("nbin"))

    // on-pulse window = the island with the largest flux, expanded —
    // selection/expansion shared with autoOffWindow (ProfileOps), here
    // clamped into [0, nbin) in unrotated coordinates
    val win = ProfileOps.expandedWindow(profile, thresholdSigma, windowExpandFrac)
      .join(broadcast(nbins), keys)
      .select(col("obs_id"), col("pol"),
        greatest(col("le"), lit(0)).as("bin_lo"),
        least(col("re") - 1, col("nbin") - 1).as("bin_hi"))

    // method "qq"
    val qq = profile.groupBy(keys.map(col): _*)
      .agg(RobustStats.qqStats(col("value")).as("mr"))
      .select(col("obs_id"), col("pol"), lit("qq").as("method"),
        col("mr.mean").as("mean"), col("mr.rms").as("rms"))

    // method "off": moments over bins outside the on-pulse window
    val off = profile.join(win, keys)
      .filter(col("bin") < col("bin_lo") || col("bin") > col("bin_hi"))
      .groupBy(keys.map(col): _*)
      .agg(avg(col("value")).as("mean"), stddev_pop(col("value")).as("rms"))
      .select(col("obs_id"), col("pol"), lit("off").as("method"),
        col("mean"), col("rms"))

    // method "poly": baseline fit over the OFF-window bins (the pulse
    // must not steer the baseline); rms = std(resid),
    // mean = mean(resid) + mean(lowest 20% of the baseline)
    val offBins = profile.join(win, keys)
      .filter(col("bin") < col("bin_lo") || col("bin") > col("bin_hi"))
      .select((keys.map(col) :+ col("bin") :+ col("value")): _*)
    val coef = offBins.groupBy(keys.map(col): _*)
      .agg(RobustStats.polyFit(col("bin").cast("double"), col("value"),
        polyDegree).as("coef"))
    val withBase = offBins.join(broadcast(coef), keys)
      .withColumn("baseline",
        aggregate(reverse(col("coef")), lit(0.0),
          (acc, c) => acc * col("bin").cast("double") + c))
      .withColumn("resid", col("value") - col("baseline"))
    val lowRank = Window.partitionBy(keys.map(col): _*).orderBy(col("baseline"))
    val polyM = withBase
      .withColumn("rk", row_number().over(lowRank))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .groupBy(keys.map(col): _*)
      .agg(
        (avg(col("resid")) +
          avg(when(col("rk") <= ceil(col("n") * 0.2), col("baseline")))).as("mean"),
        stddev_pop(col("resid")).as("rms"))
      .select(col("obs_id"), col("pol"), lit("poly").as("method"),
        col("mean"), col("rms"))

    val methods = qq.union(off).union(polyM)

    // S/N block per method: peak S/N, effective width, profile
    // significance over the on-pulse window (`snr.py:304-377`)
    val joined = profile.join(methods, keys).join(win, keys)
      .withColumn("range", col("value") - col("mean"))
      .withColumn("on", col("bin").between(col("bin_lo"), col("bin_hi")))
    joined.groupBy(col("obs_id"), col("pol"), col("method"))
      .agg(
        first(col("mean")).as("mean"),
        first(col("rms")).as("rms"),
        (max(col("range")) / first(col("rms"))).as("snr_peak"),
        (sum(col("range")) / max(col("range"))).as("weff"),
        (sum(when(col("on"), col("range"))) / first(col("rms"))).as("on_sum_snr"))
      .withColumn("prof_significance",
        when(col("weff") > 0, col("on_sum_snr") / sqrt(col("weff"))))
      .select(col("obs_id"), col("pol"), col("method"), col("mean"),
        col("rms"), col("snr_peak"), col("weff"), col("prof_significance"))
  }
}
