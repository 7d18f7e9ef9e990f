package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S12: beam-correction dimension ingest.
  *
  * The reference precomputes per-station Jones-derived beam factors once
  * and bakes them into a generated literal table (~52 stations × 248
  * frequencies, `make_casa_beamcorr.py:45-71` → `casa_beamcorr_pkg.py:1`)
  * because computing them inline was ~30× slower
  * (`lofar_fluxcal.py:89-92`). The engine keeps the same decision with an
  * engine-native format: a whitespace table `(station, freq_mhz, factor)`
  * ingested to a broadcastable Parquet dimension, sliced per station into
  * FluxCal's hamaker_carozzi model (J4 nearest-frequency lookup).
  */
object BeamCorr {

  val schema: StructType = StructType(Seq(
    StructField("station", StringType),
    StructField("freq", DoubleType),
    StructField("factor", DoubleType)))

  /** Ingest the whitespace table (comment lines `#` dropped). */
  def ingest(spark: SparkSession, path: String): DataFrame =
    BinarySources.whitespaceTable(spark, path, schema)

  /** The (freq, factor) slice FluxCal.HamakerCarozzi consumes. */
  def forStation(dim: DataFrame, station: String): DataFrame =
    dim.filter(col("station") === station).select(col("freq"), col("factor"))
}
