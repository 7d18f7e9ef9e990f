package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Station diagnostic status — the engine form of
  * `FE-map/lofar_status_map.py:124-183`: the chisq diagnostic log parses
  * into (station ear, png, S/N), joins the station geo dimension (J6),
  * and classifies stations into the core/remote/international zoom
  * groups (F10) the reference plots; the plot itself is out of engine
  * scope, the plotted relation is the output.
  */
object StatusMap {

  /** Parse diagnostic lines `… file=<png> … obs=<tok> … S/N=<v>`: the
    * ear is the obs token's second-to-last `_` segment, the station its
    * first five chars (`lofar_status_map.py:134-139`); empty S/N → 0. */
  def parseChisqLog(lines: DataFrame): DataFrame =
    lines
      .filter(!col("value").startsWith("#") && col("value").contains("obs="))
      .select(
        regexp_extract(col("value"), "file=(\\S+)", 1).as("png"),
        element_at(split(regexp_extract(col("value"), "obs=(\\S+)", 1), "_"), -2)
          .as("ear"),
        regexp_extract(col("value"), "S/N=(\\S*)", 1).as("snr_str"))
      .withColumn("station", substring(col("ear"), 1, 5))
      .withColumn("snr",
        coalesce(expr("try_cast(snr_str AS DOUBLE)"), lit(0.0)))
      .drop("snr_str")

  /** Join the geo dimension and classify into zoom groups
    * (`lofar_status_map.py:172-183`). Geo dim: (station, lat, lon). */
  def run(chisqLines: DataFrame, geo: DataFrame): DataFrame =
    parseChisqLog(chisqLines)
      .join(broadcast(geo), Seq("station"), "left")
      .withColumn("zoom",
        when(substring(col("station"), 1, 1) === "C", "core")
          .when(substring(col("station"), 1, 1) === "R", "remote")
          .otherwise("intl"))
      .select(col("station"), col("ear"), col("snr"), col("lat"),
        col("lon"), col("zoom"), col("png"))
}
