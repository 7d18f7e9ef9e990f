package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table persistence — the documented 100 TB fallback for every
  * "broadcast the per-doc dim" join in the near-dup family (q32's
  * docstring, README scale design): when the dimension outgrows the
  * broadcast ceiling, both sides persist bucketed on the join key and
  * the join plans with ZERO exchange on either side (Spark reads each
  * bucket as one partition and matches bucket ids).
  *
  * This helper owns the write discipline that makes that true:
  * same bucket count on both sides, bucket column = join key, sorted
  * within buckets so the sort-merge join skips its per-partition sort.
  * BucketingSpec asserts the exchange-free plan — the claim is tested,
  * not narrated.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (parquet). Joins on
    * `key` between tables written with the same `buckets` plan without
    * exchanges. */
  def persistBucketed(df: DataFrame, table: String, key: String,
                      buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
