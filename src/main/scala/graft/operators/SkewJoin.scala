package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join on a power-law key (a handful of "hot" station
  * names or ObsIDs carrying most of the fact rows — e.g. the per-station
  * totals of `FE-map/lofar_status_map.py`, or a hot `l_orderkey`) puts
  * every row of a hot key in ONE reducer: the stage runs at the speed of
  * its most loaded task no matter how many executors exist. Salting
  * splits each hot key into `nSalts` sub-keys: the fact side gets a
  * DETERMINISTIC salt derived from a high-cardinality column (never
  * rand() — retries/speculative tasks must re-derive the same salt), and
  * the dimension side is replicated `nSalts` times so every sub-key still
  * finds its match. The join result is row-for-row identical to the
  * unsalted join — only the partitioning changes.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) solves the same
  * problem re-actively for sort-merge joins; the explicit salt is for
  * plans AQE can't split (aggregations after the join keyed on the same
  * column, or deterministic test layouts).
  */
object SkewJoin {

  /** @param fact       large skewed side
    * @param dim        small side, replicated nSalts× (keep it dimension-sized)
    * @param keys       equi-join key columns present on both sides
    * @param saltSource high-cardinality fact column the salt derives from
    * @param nSalts     sub-keys per hot key (≈ executor count is a good default)
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                     saltSource: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
