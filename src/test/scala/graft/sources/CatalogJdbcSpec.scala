package graft.sources

import java.sql.DriverManager
import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Drives the S13 live-JDBC path against an embedded Derby database
  * (ships with Spark for the Hive metastore) — a real RDBMS round-trip,
  * not a mock: table DDL + rows go in over plain JDBC, Spark reads them
  * back through the exact production entry points. */
class CatalogJdbcSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:lta;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE fileobject (
          |  file_id BIGINT PRIMARY KEY,
          |  filename VARCHAR(128),
          |  filesize BIGINT,
          |  uri VARCHAR(256),
          |  observation_id VARCHAR(32),
          |  project VARCHAR(32))""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO fileobject VALUES (?, ?, ?, ?, ?, ?)")
      for (i <- 0 until 40) {
        ins.setLong(1, i.toLong)
        ins.setString(2, f"L$i%06d_SAP000_B000_bf.raw")
        ins.setLong(3, 1000000L + i)
        ins.setString(4, s"srm://host/path/$i")
        ins.setString(5, f"L$i%06d")
        ins.setString(6, if (i % 2 == 0) "LC0_011" else "LC0_012")
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
  }

  test("live catalog scan round-trips rows and pushes the project filter") {
    seeded
    val df = CatalogJdbc.table(spark, url, "fileobject")
      .filter(col("project") === "LC0_011")
      .select(col("filename"), col("filesize"), col("uri"), col("observation_id"))
    assert(df.count() == 20)
    // filter must reach the remote SQL, not run Spark-side over a full fetch
    val plan = df.queryExecution.executedPlan.toString
    // Derby folds unquoted identifiers to upper case — match either
    assert(plan.contains("EqualTo(PROJECT,LC0_011)") ||
        plan.contains("EqualTo(project,LC0_011)"),
      s"project filter not pushed into the JDBC scan:\n$plan")
  }

  test("column-partitioned fetch parallelizes the archive-wide scan") {
    seeded
    val df = CatalogJdbc.tablePartitioned(spark, url, "fileobject",
      "file_id", lower = 0L, upper = 40L, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 40)
    // strides must not drop or duplicate boundary rows
    assert(df.select(sum(col("filesize"))).collect().head.getLong(0) ==
      (0 until 40).map(1000000L + _).sum)
  }

  test("partitioned fetch pushes the WHERE clause and prunes columns remotely") {
    seeded
    // the archive-wide shape: a project filter over the parallel fetch —
    // each stride's remote query must carry the WHERE (PushedFilters is
    // the exact predicate list JDBCRDD compiles into the remote SQL), or
    // every executor transfers its full stride and filters Spark-side
    val df = CatalogJdbc.tablePartitioned(spark, url, "fileobject",
        "file_id", lower = 0L, upper = 40L, numPartitions = 4)
      .filter(col("project") === "LC0_011" && col("filesize") > 1000010L)
      .select(col("filename"), col("filesize"))
    assert(df.count() == 14) // even ids 12..38
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), s"no pushed-filter section:\n$plan")
    assert(plan.contains("EqualTo(PROJECT,LC0_011)") ||
        plan.contains("EqualTo(project,LC0_011)"),
      s"project filter not pushed into the partitioned JDBC scan:\n$plan")
    // prefix match: executedPlan.toString truncates long filter lists
    assert(plan.contains("GreaterThan(FILESIZE,1000") ||
        plan.contains("GreaterThan(filesize,1000"),
      s"filesize range not pushed into the partitioned JDBC scan:\n$plan")
    // parallel fetch retained alongside the pushdown
    assert(plan.contains("numPartitions=4"),
      s"partitioned fetch lost its strides:\n$plan")
    // column pruning reaches the remote SELECT list: the scan's output
    // must not carry unprojected catalog columns (URI/OBSERVATION_ID)
    val scanLine = plan.linesIterator.find(_.contains("JDBCRelation")).getOrElse("")
    assert(!scanLine.toUpperCase.contains("URI") &&
        !scanLine.toUpperCase.contains("OBSERVATION_ID"),
      s"remote scan fetches unprojected columns:\n$scanLine")
  }
}
