package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S13 live path: the archive catalog over `spark.read.jdbc` — what
  * `LTA/lta-query.py:182-193` does against the LTA's Oracle RDBMS
  * (superquery → FILENAME/FILESIZE/CREATION_DATE/URI/OBSERVATIONID
  * rows). The batch queries consume the same relation shape from
  * parquet mirrors (`Tables` — the harness design, since the sandbox
  * has no Oracle); this entry point swaps a mirror for the live
  * database without touching any downstream operator.
  *
  * Scale shape: catalog tables are dimension-sized per project but can
  * reach fact size archive-wide, so the read supports column-partitioned
  * fetch (`partitionColumn`/bounds → one remote query per stride, pulled
  * by parallel executors) and Spark pushes filters and column pruning
  * into the remote SQL — a `WHERE project = …` never transfers the
  * whole catalog. Credentials ride in `props`, never in the URL.
  */
object CatalogJdbc {

  def table(spark: SparkSession, url: String, table: String,
            props: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, connProps(props))

  /** Column-partitioned variant for archive-wide scans: `numPartitions`
    * strides over `[lower, upper]` on a numeric/date `partitionCol`. */
  def tablePartitioned(spark: SparkSession, url: String, table: String,
                       partitionCol: String, lower: Long, upper: Long,
                       numPartitions: Int,
                       props: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      connProps(props))

  private def connProps(props: Map[String, String]): Properties = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
}
