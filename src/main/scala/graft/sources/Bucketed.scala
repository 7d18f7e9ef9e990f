package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the concrete form of the
  * "at fleet scale the broadcast dim becomes a bucketed co-located join"
  * swap documented on the near-dup pipelines (q32) and of the reference's
  * key-based file routing (`cluster-copy.py:340-359`, PART → node).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key lets Spark plan the join with NO exchange on either side:
  * the shuffle is paid once at write time and amortized over every
  * subsequent join — the decisive layout choice for 100 TB fact-to-fact
  * joins. BucketedSpec asserts the exchange-free plan.
  */
object Bucketed {

  /** Persist `df` as a bucketed+sorted catalog table. */
  def write(df: DataFrame, table: String, bucketCol: String,
            nBuckets: Int, path: String): Unit =
    df.write.format("parquet")
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
