package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S11: gain-cube ingest (`fluxcal/lofar_gain.py:160-220`).
  *
  * The sensitivity table is a whitespace text file of 29·361·91 numbers —
  * a (freq, az, el) cube with el the fastest-running index, values being
  * Aeff/T with T = Trec + Tsky(f) baked in by the simulation. The ingest
  * job:
  *
  *   1. tokenizes the file preserving order (RDD zipWithIndex — stable
  *      because text-file partition order is deterministic; this is a
  *      one-time dimension build, not a hot path),
  *   2. recovers (freq_idx, az, el) from the linear index,
  *   3. averages over azimuth (stations are randomly rotated,
  *      `lofar_gain.py:193`),
  *   4. un-normalizes by T(f) = 400 + (λ/0.2008)^2.55 + (f/1e9)^1.8 + 2.7
  *      (`lofar_gain.py:196-220`) to recover Aeff proper.
  *
  * Output: the broadcastable dimension `gain(freq, el, v)` consumed by
  * `GridInterp.bilinear` (J8) and the FluxCal table-gain model. The real
  * 953k-value file is absent from the reference snapshot
  * (`.MISSING_LARGE_BLOBS`); fixtures synthesize the same shape.
  */
object GainCube {

  /** T used to normalize the table on file (Trec=400 plus the simulation's
    * Tsky model), as a function of freq in MHz. */
  def tableT(freqMhz: Double): Double = {
    val fHz = freqMhz * 1e6
    val lambda = 3.0e8 / fHz
    400.0 + math.pow(lambda / 0.2008, 2.55) + math.pow(fHz / 1e9, 1.8) + 2.7
  }

  def ingest(spark: SparkSession, path: String,
             flowMhz: Double = 110.0, fstepMhz: Double = 5.0,
             nFreq: Int = 29, nAz: Int = 361, nEl: Int = 91): DataFrame = {
    import spark.implicits._
    val tokens = spark.read.textFile(path).rdd
      .flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .zipWithIndex()
      .map { case (v, i) => (i, v.toDouble) }
    val raw = tokens.toDF("idx", "v")
    val perCell = nAz.toLong * nEl
    val azMean = raw
      .withColumn("freq_idx", (col("idx") / perCell).cast("int"))
      .withColumn("el", (col("idx") % nEl).cast("int"))
      .groupBy(col("freq_idx"), col("el"))
      .agg(avg(col("v")).as("g")) // mean over the azimuth axis
    val freqMhz = lit(flowMhz) + lit(fstepMhz) * col("freq_idx")
    val fHz = freqMhz * 1e6
    val lambda = lit(3.0e8) / fHz
    val t = lit(400.0) + pow(lambda / 0.2008, 2.55) + pow(fHz / 1e9, 1.8) + 2.7
    azMean
      .withColumn("freq", freqMhz)
      .withColumn("v", col("g") * t)
      .select(col("freq"), col("el").cast("double").as("el"), col("v"))
  }
}
