package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Cube

/** Single-pulse characterization — the engine form of `pulse_info.py`:
  * multi-scale boxcar matched filtering over the folded profile
  * (W3, `pulse_info.py:160-186`), then the per-pulse SPECTRUM over the
  * detected time window with friends-of-friends channel islands
  * (W2, `pulse_info.py:188-217`, re-specified order-insensitively as
  * gap-and-island sessionization per SURVEY §7 "hard parts").
  *
  * Every window partitions by (obs_id, pol) — one profile is a bounded
  * series (nbin ≤ 4096), so thousands of pulses process in parallel and
  * nothing ever moves to a single partition.
  */
object PulseInfo {

  /** The reference's boxcar width ladder (`pulse_info.py:114-116`). */
  val DefaultWidths: Seq[Int] = Seq(2, 3, 4, 6, 9, 14, 20)

  /** W3: best (width, offset) per profile — moving sums at each width,
    * score = sum/√width, argmax across widths and positions with a
    * deterministic (score, width, bin) tie-break. The profile is FOLDED,
    * so the boxcar is circular: the first maxWidth−1 bins are appended
    * once more past nbins so a window starting near the end wraps around
    * the phase boundary instead of truncating. */
  def bestBoxcar(profile: DataFrame, nbins: Int,
                 widths: Seq[Int] = DefaultWidths): DataFrame = {
    val maxW = widths.max
    val ext = profile.unionByName(
      profile.filter(col("bin") < maxW - 1)
        .withColumn("bin", col("bin") + nbins))
    val w = Window.partitionBy(col("obs_id"), col("pol")).orderBy(col("bin"))
    val scored = widths.foldLeft(ext) { (df, wd) =>
      df.withColumn(s"__s$wd",
        sum(col("value")).over(w.rowsBetween(0, wd - 1)) /
          math.sqrt(wd.toDouble))
    }
    val cands = widths.map(wd =>
      struct(col(s"__s$wd").as("score"), lit(wd).as("width"),
        col("bin").as("toffset")))
    val best = scored
      .filter(col("bin") < nbins) // each circular start exactly once
      .withColumn("__cand", greatest(cands: _*))
      .groupBy(col("obs_id"), col("pol"))
      .agg(max(col("__cand")).as("b"))
      .select(col("obs_id"), col("pol"), col("b.width").as("width"),
        col("b.toffset").as("toffset"), col("b.score").as("aver_prof_snr"))
    // peak SNR inside the chosen (circular) window (`pulse_info.py:184`)
    profile.join(broadcast(best), Seq("obs_id", "pol"))
      .filter(pmod(col("bin") - col("toffset"), lit(nbins)) < col("width"))
      .groupBy(col("obs_id"), col("pol"), col("width"), col("toffset"),
        col("aver_prof_snr"))
      .agg(max(col("value")).as("peak_prof_snr"))
  }

  /** Per-pulse spectrum over the detected window: per-channel sum of the
    * cube inside the circular window [toffset, toffset+width)
    * (`pulse_info.py:189`). */
  def pulseSpectrum(cube: Cube, best: DataFrame, nbins: Int): DataFrame =
    cube.samples.join(broadcast(best), Seq("obs_id", "pol"))
      .filter(pmod(col("bin") - col("toffset"), lit(nbins)) < col("width"))
      .groupBy(col("obs_id"), col("pol"), col("chan"), col("width"))
      .agg(sum(col("value")).as("spec"))

  /** W2: friends-of-friends channel islands over the spectrum — channels
    * ≥ threshold sessionize into contiguous patches; each patch reports
    * (foffset, fwidth, aver_snr = patch sum / (width·fwidth)), matching
    * the reference's island loop output (`pulse_info.py:201-217`). */
  def spectrumIslands(spectrum: DataFrame, threshold: Double): DataFrame = {
    val keys = Seq(col("obs_id"), col("pol"))
    val w = Window.partitionBy(keys: _*).orderBy(col("chan"))
    val ws = w.rowsBetween(Window.unboundedPreceding, 0)
    spectrum
      .filter(col("spec") >= threshold)
      .withColumn("gap",
        when(col("chan") - lag(col("chan"), 1).over(w) === 1, 0).otherwise(1))
      .withColumn("island", sum(col("gap")).over(ws))
      .groupBy(col("obs_id"), col("pol"), col("island"))
      .agg(min(col("chan")).as("foffset"),
        count(lit(1)).as("fwidth"),
        (sum(col("spec")) / (first(col("width")) * count(lit(1))))
          .as("aver_snr"))
      .drop("island")
  }

  /** Full pipeline: profile search → window spectrum → channel islands. */
  def run(cube: Cube, threshold: Double, nbins: Int,
          widths: Seq[Int] = DefaultWidths): (DataFrame, DataFrame) = {
    val profile = graft.operators.ProfileOps.totalProfile(cube)
      .select(col("obs_id"), col("pol"), col("bin"), col("value"))
    val best = bestBoxcar(profile, nbins, widths)
    val islands = spectrumIslands(pulseSpectrum(cube, best, nbins), threshold)
    (best, islands)
  }
}
