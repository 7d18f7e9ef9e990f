package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-and-island sessionization over a set of DISTINCT integer keys
  * (trim_bins semantics, `fluxcal/snr.py:70-99`) WITHOUT a global window.
  *
  * The naive form — `Window.orderBy(k)` over all keys — moves every key to
  * one partition, so the operator stops scaling the moment the key set
  * grows with the fact table. This version exploits that islands are runs
  * of CONSECUTIVE integers:
  *
  *  1. bucket keys by `k div bucketSize` and sessionize per bucket — a
  *     window PARTITIONED by bucket, so it scales out;
  *  2. a local island can only continue across a bucket boundary when it
  *     ends on the bucket's last integer slot (`end % B == B-1`) or starts
  *     on the first (`start % B == 0`) — at most two candidates per
  *     bucket. Only those go through the chain-merge window, a
  *     ~|keys|/bucketSize-row problem (documented reduction bound, same
  *     contract as the q51 chunk aggregate);
  *  3. everything else passes through untouched.
  *
  * Output: `(island_start, island_end, n_members)`, one row per island.
  * Keys must be distinct; negative keys (64-bit hash ids) are handled —
  * bucketing uses floor division so bucket edges stay pmod-aligned.
  */
object Islands {

  def consecutive(keys: DataFrame, keyCol: String,
                  bucketSize: Long = 4096L): DataFrame = {
    val local = localIslands(keys, keyCol, bucketSize)
    val touchesRight = pmod(col("island_end"), lit(bucketSize)) === (bucketSize - 1)
    val touchesLeft = pmod(col("island_start"), lit(bucketSize)) === 0
    val isCandidate = touchesRight || touchesLeft
    val interior = local.filter(!isCandidate)
      .select(col("island_start"), col("island_end"), col("n_members"))
    // Chain-merge across bucket edges: candidate islands merge iff the next
    // one starts exactly one past this one's end. The window is global but
    // over ≤ 2 islands per bucket, not over the key set.
    val wc = Window.orderBy(col("island_start"))
    val wcs = wc.rowsBetween(Window.unboundedPreceding, 0)
    val merged = local.filter(isCandidate)
      .withColumn("gap",
        when(col("island_start") - lag(col("island_end"), 1).over(wc) === 1, 0)
          .otherwise(1))
      .withColumn("chain", sum(col("gap")).over(wcs))
      .groupBy(col("chain"))
      .agg(min(col("island_start")).as("island_start"),
        max(col("island_end")).as("island_end"),
        sum(col("n_members")).as("n_members"))
      .select(col("island_start"), col("island_end"), col("n_members"))
    interior.unionByName(merged)
  }

  /** Per-bucket sessionization: the first key of each bucket always opens a
    * new local island, so no island spans buckets at this level. */
  private def localIslands(keys: DataFrame, keyCol: String,
                           bucketSize: Long): DataFrame = {
    val wl = Window.partitionBy(col("__b")).orderBy(col("__k"))
    val wls = wl.rowsBetween(Window.unboundedPreceding, 0)
    // integral FLOOR division: a double quotient loses exactness for keys
    // ≥ 2^53 (64-bit hash-derived ids), and SQL `div` alone truncates
    // toward zero — for negative hash ids that would misalign bucket
    // boundaries with the pmod-based edge filter and silently split
    // cross-bucket islands. floorDiv = div minus one when the remainder
    // is negative (bucketSize > 0).
    val d = expr(s"__k div ${bucketSize}L")
    keys.select(col(keyCol).as("__k"))
      .withColumn("__b",
        when(col("__k") % bucketSize < 0, d - 1).otherwise(d))
      .withColumn("gap",
        when(col("__k") - lag(col("__k"), 1).over(wl) === 1, 0).otherwise(1))
      .withColumn("lisl", sum(col("gap")).over(wls))
      .groupBy(col("__b"), col("lisl"))
      .agg(min(col("__k")).as("island_start"),
        max(col("__k")).as("island_end"),
        count(lit(1)).as("n_members"))
  }
}
