package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flagged-tile accounting — the engine form of
  * `fluxcal/get_flagged_tiles.py:79-131`: per-observation-date flagged
  * counts joined to the used-station list (J9 membership), totals and
  * bad-tile fraction with the station-class denominators (F10: CS/RS/intl
  * → 24/48/96 for HBA sub-stations, 48/48/96 for LBA), and the worst
  * station with ties kept and its class-priority worst fraction
  * (CS beats RS beats international, `get_flagged_tiles.py:120-130`).
  */
object GetFlaggedTiles {

  private def cs(c: Column) = substring(c, 1, 2) === "CS"
  private def rs(c: Column) = substring(c, 1, 2) === "RS"

  /** @param flagged rows (date, time, station, ntiles) — the S9 table
    * @param used    rows (station) — stations of the observation
    * @param date    observation date filter (F4)
    * @param hba     antenna set: HBA denominators 24/48/96, LBA 48/48/96
    * @return one row: n_flagged, total_tiles, fraction, worst_n,
    *         worst_stations (sorted, ties kept), worst_fraction */
  def run(flagged: DataFrame, used: DataFrame, date: String,
          hba: Boolean): DataFrame = {
    val st = col("station")
    // per-station rows are bounded by the station count (tens) — persist
    // so the abort gates and the aggregations below share ONE scan of the
    // flagged table
    val rows = flagged.filter(col("date") === date)
      .join(used, Seq("station"), "left_semi")
      .select(st, col("ntiles").cast("int").as("ntiles"))
      .distinct()
      .persist()
    // The reference ABORTS on: a used station with no flagged-info line
    // (`get_flagged_tiles.py:86-88` — silently dropping it would inflate
    // the bad-tile fraction), conflicting duplicate lines (`:89-92`), and
    // an unparseable count (its int() raises; a null from a lenient cast
    // must not silently deflate the totals). Eager gates ARE the
    // reference's semantic; the sets involved are tiny. try/finally so
    // the abort path releases the cache too.
    try {
      val bad = rows.groupBy(st).agg(
        count(lit(1)).as("c"),
        sum(when(col("ntiles").isNull, 1).otherwise(0)).as("nulls"))
        .filter(col("c") > 1 || col("nulls") > 0).count()
      require(bad == 0,
        s"$bad station(s) with conflicting or unparseable flagged-tile lines for $date")
      val missing = used.select(st).distinct()
        .join(rows, Seq("station"), "left_anti").count()
      require(missing == 0,
        s"$missing used station(s) missing flagged-tile info for $date")
    } catch {
      case e: Throwable => rows.unpersist(); throw e
    }
    val denom =
      if (hba) when(cs(st), 24).when(rs(st), 48).otherwise(96)
      else when(cs(st) || rs(st), 48).otherwise(96)
    val perStation = rows.withColumn("cap", denom)
    val totals = perStation.agg(
      sum(col("ntiles")).as("n_flagged"),
      sum(col("cap")).as("total_tiles"),
      (sum(col("ntiles")).cast("double") / sum(col("cap")).cast("double"))
        .as("fraction"),
      max(col("ntiles")).as("worst_n"))
    val worstSet = perStation
      .join(broadcast(totals.select(col("worst_n"))),
        col("ntiles") === col("worst_n"))
      .agg(sort_array(collect_list(st)).as("worst_stations"))
    // worst fraction: class priority over the tied set (CS → 24 for HBA,
    // else RS → 48, else 96; LBA folds CS into the 48 class)
    val worstCap: Column =
      if (hba)
        when(exists(col("worst_stations"), s => cs(s)), 24.0)
          .when(exists(col("worst_stations"), s => rs(s)), 48.0)
          .otherwise(96.0)
      else
        when(exists(col("worst_stations"), s => cs(s) || rs(s)), 48.0)
          .otherwise(96.0)
    val result = totals.crossJoin(broadcast(worstSet))
      .withColumn("worst_fraction", col("worst_n").cast("double") / worstCap)
    // the output is ONE summary row — materialize it and release the
    // per-station cache instead of leaking a pinned dataset per call
    val out = result.collect()
    rows.unpersist()
    flagged.sparkSession.createDataFrame(
      java.util.Arrays.asList(out: _*), result.schema)
  }
}
