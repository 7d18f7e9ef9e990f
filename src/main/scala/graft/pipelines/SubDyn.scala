package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.BinarySources

/** `subdyn.py` analog: int16 subband files → windowed averaging into a
  * dynamic spectrum (A1) → per-cell robust level → sigma-clip mask (A14)
  * → per-subband RFI fractions and the excluded-band report (K4).
  */
object SubDyn {

  final case class Config(
      avgWindow: Int = 7630,       // `subdyn.py:23` default Nbins
      clipSigma: Double = 3.0,
      excludeLimit: Double = 0.5)  // band excluded if ≥ this clipped frac

  final case class Result(dynspec: DataFrame, rfiReport: DataFrame,
                          badBands: DataFrame)

  def run(spark: SparkSession, glob: String, cfg: Config): Result = {
    // dynamic spectrum: (subband, window) mean — one keyed aggregation
    val dynspec = BinarySources.int16Subbands(spark, glob)
      .withColumn("win", (col("idx") / cfg.avgWindow).cast(LongType))
      .groupBy(col("subband"), col("win"))
      .agg(avg(col("value").cast(DoubleType)).as("power"),
        count(lit(1)).as("n_samples"))
    // per-subband robust level → clip mask (`subdyn.py:447-469`)
    val stats = dynspec.groupBy(col("subband"))
      .agg(avg(col("power")).as("m"), stddev_pop(col("power")).as("s"))
    val masked = dynspec.join(broadcast(stats), Seq("subband"))
      .withColumn("level",
        when(col("s") > 0, (col("power") - col("m")) / col("s")).otherwise(0.0))
      .withColumn("clipped", abs(col("level")) > cfg.clipSigma)
    val rfiReport = masked.groupBy(col("subband"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("clipped"), 1L).otherwise(0L)).as("n_clipped"),
        avg(when(col("clipped"), 1.0).otherwise(0.0)).as("rfi_frac"))
    val badBands = rfiReport.filter(col("rfi_frac") >= cfg.excludeLimit)
      .select(col("subband"), col("rfi_frac"))
    Result(masked.drop("m", "s"), rfiReport, badBands)
  }
}
