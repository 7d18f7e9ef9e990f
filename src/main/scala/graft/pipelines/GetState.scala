package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hardware-state-at-date lookup — the engine form of
  * `tiles/lofar_antenna_state/getState.py`: the pipe-delimited state log
  * parses into an event relation (station, band, element, ts, value)
  * and the query "which antennas were OFF during observation T" is the
  * as-of temporal join J5 (`getState.py:275-301`): last state change
  * strictly before T per element, OFF when the recorded value > 10.
  *
  * The window partitions by (station, band, element) — per-element event
  * chains are short, the element population is what scales, so this
  * parallelizes the right way.
  */
object GetState {

  /** S9-style parse of `LOFAR.PIC…|value|timestamp` state-log lines into
    * the event relation. Line shape (`getState.py:77-91`):
    * `LOFAR.PIC.<ring>.<station>.<band><element>…|<value>|<ts>|…`. */
  def parseLog(lines: DataFrame): DataFrame =
    lines
      .filter(col("value").contains("LOFAR.PIC"))
      .select(split(col("value"), "\\|").as("c"))
      .select(split(element_at(col("c"), 1), "\\.").as("path"),
        trim(element_at(col("c"), 2)).as("state_value"),
        trim(element_at(col("c"), 3)).as("ts_str"))
      .select(
        element_at(col("path"), 4).as("station"),
        substring(element_at(col("path"), 5), 1, 3).as("band"),
        expr("substring(element_at(path, 5), 4)").as("element"),
        col("state_value").cast("int").as("state_value"),
        to_timestamp(col("ts_str")).as("ts"))

  /** State as of `procDate`: latest event strictly before it per
    * (station, band, element); OFF when value > 10
    * (`getState.py:281-287`). */
  def stateAt(events: DataFrame, procDate: String): DataFrame = {
    val w = Window.partitionBy(col("station"), col("band"), col("element"))
      .orderBy(col("ts").desc)
    events
      .filter(col("ts") < to_timestamp(lit(procDate)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("state",
        when(col("state_value") > 10, "off").otherwise("on"))
      .select(col("station"), col("band"), col("element"), col("ts"),
        col("state_value"), col("state"))
  }

  /** Per (station, band): the OFF elements and their count — the
    * antennas_off list the reference prints per station/mode. */
  def antennasOff(events: DataFrame, procDate: String): DataFrame =
    stateAt(events, procDate)
      .filter(col("state") === "off")
      .groupBy(col("station"), col("band"))
      .agg(sort_array(collect_list(col("element"))).as("antennas_off"),
        count(lit(1)).as("n_off"))
}
