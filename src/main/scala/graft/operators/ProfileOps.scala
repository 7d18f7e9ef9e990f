package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.AstroFunctions
import graft.functions.RobustStats

/** The folded-archive cube in long format (SURVEY.md §1.1):
  *
  *  - `samples(obs_id, subint, pol, chan, bin, value)` — the 4-D cube
  *    `r[subint, pol, chan, bin]` of `fluxcal/lofar_fluxcal.py:701-703`
  *  - `weights(obs_id, subint, chan, weight)` — the per-(subint,chan)
  *    weight matrix (`lofar_fluxcal.py:409,434,463`); weight 0 = zapped
  *
  * Every operator is a declarative DataFrame transform: scrunches are
  * keyed aggregations (one shuffle on the scrunch key), rotations and
  * dedispersion are stateless bin re-keys (zero shuffle), normalization
  * is a grouped UDAF joined back. Nothing collects to the driver, so the
  * same plan runs on one laptop partition or a 100 TB cube partitioned
  * by (obs_id, subint).
  */
final case class Cube(samples: DataFrame, weights: DataFrame)

object ProfileOps {
  private val sKey = Seq("obs_id", "subint", "pol", "chan")

  /** samples ⋈ weights on (obs_id, subint, chan) — weights is smaller by
    * a factor nbin·npol; at scale both sides co-partition on (obs_id,
    * subint) so this is a local join after the scan. */
  def weighted(c: Cube): DataFrame =
    c.samples.join(c.weights, Seq("obs_id", "subint", "chan"))

  private def wavg: Column =
    when(sum(col("weight")) > 0,
      sum(col("value") * col("weight")) / sum(col("weight"))).otherwise(0.0)

  /** A1 tscrunch: average k subints (weighted). */
  def tscrunch(c: Cube, k: Int): Cube = {
    val s = weighted(c)
      .withColumn("subint", (col("subint") / k).cast(IntegerType))
      .groupBy((sKey :+ "bin").map(col): _*)
      .agg(wavg.as("value"))
    val w = c.weights
      .withColumn("subint", (col("subint") / k).cast(IntegerType))
      .groupBy(col("obs_id"), col("subint"), col("chan"))
      .agg(sum(col("weight")).as("weight"))
    Cube(s, w)
  }

  /** A1 fscrunch: average k channels (weighted). */
  def fscrunch(c: Cube, k: Int): Cube = {
    val s = weighted(c)
      .withColumn("chan", (col("chan") / k).cast(IntegerType))
      .groupBy((sKey :+ "bin").map(col): _*)
      .agg(wavg.as("value"))
    val w = c.weights
      .withColumn("chan", (col("chan") / k).cast(IntegerType))
      .groupBy(col("obs_id"), col("subint"), col("chan"))
      .agg(sum(col("weight")).as("weight"))
    Cube(s, w)
  }

  /** A1 bscrunch: merge k phase bins (plain mean — weight is constant
    * within a (subint,chan) cell). */
  def bscrunch(c: Cube, k: Int): Cube =
    c.copy(samples = c.samples
      .withColumn("bin", (col("bin") / k).cast(IntegerType))
      .groupBy((sKey :+ "bin").map(col): _*)
      .agg(avg(col("value")).as("value")))

  /** A1 pscrunch: average polarizations. */
  def pscrunch(c: Cube): Cube =
    c.copy(samples = c.samples
      .withColumn("pol", lit(0))
      .groupBy((sKey :+ "bin").map(col): _*)
      .agg(avg(col("value")).as("value")))

  /** R1 circular rotation: bin := (bin + shift) mod nbins — a stateless
    * re-key, no shuffle, no window (`fluxcal/snr.py:36-46`). */
  def rotate(c: Cube, shiftBins: Int, nbins: Int): Cube =
    c.copy(samples =
      c.samples.withColumn("bin", pmod(col("bin") + shiftBins, lit(nbins))))

  /** R3 period-doubling view: the profile appended to itself with bins
    * shifted by one period (`pulsestack.py:735-737`) — a union re-key, so
    * downstream ops see bins 0..2·nbins−1. */
  def periodDouble(c: Cube, nbins: Int): Cube =
    c.copy(samples = c.samples.unionByName(
      c.samples.withColumn("bin", col("bin") + nbins)))

  /** F9 finite cleanup: NaN/±Inf → replacement, the reference's
    * `np.where(np.isfinite(x), x, 0)` idiom (`spspectra.py:20-21`,
    * `pulse_info.py:26-27`, `get_rough_tscat.py:83-86`). */
  def cleanFinite(c: Cube, replacement: Double = 0.0): Cube =
    c.copy(samples = c.samples.withColumn("value",
      finiteOr(col("value"), replacement)))

  /** Column form of F9 for non-cube pipelines. */
  def finiteOr(c: Column, replacement: Double = 0.0): Column =
    when(isnan(c) || abs(c) === Double.PositiveInfinity, lit(replacement))
      .otherwise(c)

  /** R2 incoherent dedispersion: per-channel circular shift by the
    * dispersion delay in bins (`simple-sh-scripts/dide`, psrchive
    * `raw.dedisperse()` semantics at `fluxcal/lofar_fluxcal.py:381`).
    * Channel freq = f0 + chan·chanBw MHz; reference frequency = top. */
  def dedisperse(c: Cube, dm: Double, f0Mhz: Double, chanBwMhz: Double,
                 fRefMhz: Double, tbinSec: Double, nbins: Int): Cube = {
    val fChan = AstroFunctions.chanFreq(lit(f0Mhz), col("chan"), lit(chanBwMhz))
    val delaySec =
      AstroFunctions.dispersionPairMs(lit(dm), fChan, lit(fRefMhz)) / 1000.0
    val shift = round(delaySec / tbinSec).cast(IntegerType)
    c.copy(samples = c.samples
      .withColumn("bin", pmod(col("bin") - shift, lit(nbins))))
  }

  /** A7 weight re-normalization: scale by max(subint duration)/duration,
    * then divide by the global max weight (`lofar_fluxcal.py:409-431`).
    * Global scalars travel as a broadcast 1-row join, never a collect. */
  def normalizeWeights(c: Cube, durations: DataFrame): Cube = {
    val wd = c.weights.join(broadcast(durations), Seq("obs_id", "subint"))
    val maxDur = durations.agg(max(col("dur")).as("max_dur"))
    val scaled = wd.crossJoin(broadcast(maxDur))
      .withColumn("weight", col("weight") * col("max_dur") / col("dur"))
    val maxW = scaled.agg(max(col("weight")).as("max_w"))
    val normed = scaled.crossJoin(broadcast(maxW))
      .withColumn("weight",
        when(col("max_w") > 0, col("weight") / col("max_w")).otherwise(0.0))
      .select(col("obs_id"), col("subint"), col("chan"), col("weight"))
    c.copy(weights = normed)
  }

  /** A6 RFI fraction: share of zapped (subint, chan) cells per obs. */
  def rfiFraction(c: Cube): DataFrame =
    c.weights.groupBy(col("obs_id"))
      .agg(avg(when(col("weight") === 0, 1.0).otherwise(0.0)).as("rfi_frac"),
        count(lit(1)).as("n_cells"))

  /** A8 per-cell Q-Q normalization: value := (value − mean)/rms with
    * robust (mean, rms) per (obs, subint, pol, chan) — the calibration
    * core (`lofar_fluxcal.py:752-756`). One grouped UDAF + one join. */
  def qqNormalize(c: Cube, osmBound: Double = 1.0): Cube = {
    val stats = c.samples.groupBy(sKey.map(col): _*)
      .agg(RobustStats.qqStats(col("value"), osmBound).as("mr"))
      .select(sKey.map(col) :+ col("mr.mean").as("qq_mean") :+
        col("mr.rms").as("qq_rms"): _*)
    val s = c.samples.join(stats, sKey)
      .withColumn("value",
        when(col("qq_rms") > 0,
          (col("value") - col("qq_mean")) / col("qq_rms")).otherwise(0.0))
      .drop("qq_mean", "qq_rms")
    c.copy(samples = s)
  }

  /** A4 total-band profile: zap-aware sum over subints and channels. */
  def totalProfile(c: Cube): DataFrame =
    weighted(c)
      .filter(col("weight") > 0)
      .groupBy(col("obs_id"), col("pol"), col("bin"))
      .agg(sum(col("value")).as("value"), count(lit(1)).as("n_cells"))

  /** A3 spectrum re-binning: k input channels → 1 output channel,
    * normalized by the count of non-zapped contributing cells
    * (`lofar_fluxcal.py:835-864`). */
  def rebinSpectrum(c: Cube, k: Int, skipChans: Int = 0): DataFrame =
    weighted(c)
      .filter(col("chan") >= skipChans && col("weight") > 0)
      .withColumn("outch", ((col("chan") - skipChans) / k).cast(IntegerType))
      .groupBy(col("obs_id"), col("pol"), col("outch"), col("bin"))
      .agg((sum(col("value")) / count(lit(1))).as("value"),
        count(lit(1)).as("n_good"))

  /** A5 profile statistics block per (obs, pol): peak flux, peak bin,
    * mean, effective width Weff = Σ/peak, duty cycle, significance
    * (`lofar_fluxcal.py:867-886`, `fluxcal/snr.py:304-377`). */
  def profileStats(profile: DataFrame, nbins: Int): DataFrame =
    profile.groupBy(col("obs_id"), col("pol"))
      .agg(
        max(col("value")).as("peak"),
        max_by(col("bin"), struct(col("value"), col("bin"))).as("peak_bin"),
        sum(col("value")).as("total"),
        avg(col("value")).as("mean"),
        stddev_pop(col("value")).as("rms"),
        count(lit(1)).as("nbin"))
      .withColumn("weff", when(col("peak") > 0, col("total") / col("peak")))
      .withColumn("duty_cycle", col("weff") / nbins)
      .withColumn("significance",
        when(col("weff") > 0, col("total") / sqrt(col("weff"))))

  /** A2 phase folding of a time series against a constant period (the
    * polyco-segment variant joins period as-of first — see q22):
    * `pulsestack.py:583-620`. `groupCols` prepends extra fold keys (one
    * profile per file/series) — the single fold implementation serves
    * both the single-series and per-file pipelines. */
  def fold(ts: DataFrame, tCol: String, vCol: String,
           t0: Double, periodSec: Double, nbins: Int,
           groupCols: Seq[String] = Nil): DataFrame = {
    val turns = (col(tCol) - t0) / periodSec
    val phase = turns - floor(turns)
    ts.withColumn("ibin", floor(phase * nbins).cast(IntegerType))
      .groupBy((groupCols.map(col) :+ col("ibin")): _*)
      .agg(count(lit(1)).as("n"), sum(col(vCol)).as("total"),
        avg(col(vCol)).as("profile"))
  }

  /** W4-composition helper: find the on-pulse bin range as the island
    * around the peak above a threshold (gap-and-island over bins). */
  def onPulseWindow(profile: DataFrame, thresholdSigma: Double = 2.5): DataFrame = {
    val stats = profile.groupBy(col("obs_id"), col("pol"))
      .agg(avg(col("value")).as("m"), stddev_pop(col("value")).as("s"))
    val flagged = profile.join(broadcast(stats), Seq("obs_id", "pol"))
      .filter(col("value") > col("m") + col("s") * thresholdSigma)
    val w = Window.partitionBy(col("obs_id"), col("pol")).orderBy(col("bin"))
    val ws = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged
      .withColumn("gap", when(col("bin") - lag(col("bin"), 1).over(w) === 1, 0).otherwise(1))
      .withColumn("island", sum(col("gap")).over(ws))
      .groupBy(col("obs_id"), col("pol"), col("island"))
      .agg(min(col("bin")).as("bin_lo"), max(col("bin")).as("bin_hi"),
        count(lit(1)).as("width"), sum(col("value")).as("island_flux"))
  }

  /** Shared W4 window selection (`snr.py:126-128`): the highest-flux
    * on-pulse island widened by `expandFrac` of the ISLAND width on each
    * side. One row per (obs_id, pol): [le, re) with re EXCLUSIVE —
    * consumed clamped-unrotated by Snr and rotated by autoOffWindow, so
    * the expansion arithmetic lives in exactly one place. */
  private[graft] def expandedWindow(profile: DataFrame,
                                    thresholdSigma: Double,
                                    expandFrac: Double): DataFrame = {
    val keys = Seq("obs_id", "pol")
    onPulseWindow(profile, thresholdSigma)
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(col("bin_lo"), col("bin_hi")),
        col("island_flux")).as("w"))
      .withColumn("excl", col("w.bin_hi") - col("w.bin_lo"))
      .select(keys.map(col) :+
        (col("w.bin_lo") - floor(col("excl") * expandFrac)).cast(IntegerType).as("le") :+
        (col("w.bin_hi") + 1 + floor(col("excl") * expandFrac)).cast(IntegerType).as("re"): _*)
  }

  /** W4 in full (`snr.py:104-146` auto_find_off_window): detect the
    * on-pulse island, widen it by `expandFrac` of the ISLAND width on
    * each side (the reference's extra-caution margin), then ROTATE each
    * (obs_id, pol) profile so the window's left edge lands at bin 0 —
    * after which the off-pulse region is simply `[off_lo, nbins)`.
    *
    * Profiles with NO bin above the threshold keep rotation 0 and an
    * empty on-window (off region = the whole profile), matching the
    * reference's no-signal branch (`snr.py:140-144`) — they are NOT
    * silently dropped.
    *
    * Returns (rotated profile, bounds) where bounds carries one row per
    * profile: `rot_bins` (the applied rotation, the reference's running
    * rot_bins bookkeeping) and `off_lo` (= window width). The rotation
    * is the R1 re-key with a per-profile shift joined in broadcast —
    * no window over samples, no collect.
    *
    * CONTRACT: `profile` is read FOUR times (stats, flagged, rotated,
    * bounds) and Spark shares no plan subtrees across those reads — a
    * caller deriving it from an expensive upstream (a fold, a groupBy)
    * must persist it first. The folded profile is nprofiles*nbins rows
    * at any corpus size, so caching is always safe. */
  def autoOffWindow(profile: DataFrame, nbins: Int,
                    thresholdSigma: Double = 2.5,
                    expandFrac: Double = 0.15): (DataFrame, DataFrame) = {
    val keys = Seq("obs_id", "pol")
    val win = expandedWindow(profile, thresholdSigma, expandFrac)
    val rotated = profile.join(broadcast(win), keys, "left")
      .withColumn("bin", pmod(col("bin") - coalesce(col("le"), lit(0)), lit(nbins)))
      .drop("le", "re")
    val bounds = profile.select(keys.map(col): _*).distinct()
      .join(broadcast(win), keys, "left")
      .select(keys.map(col) :+
        coalesce(col("le"), lit(0)).as("rot_bins") :+
        coalesce(col("re") - col("le"), lit(0)).as("off_lo") :+
        lit(nbins).as("off_hi"): _*)
    (rotated, bounds)
  }
}
