package graft

import java.nio.file.{Files, Paths}

/** Measurement tool (optimization rounds): dump `.explain("formatted")`
  * for named registry queries to text files, so plan claims in
  * OPTIMIZATION_r*.md are auditable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query substrings...>
  * Writes <outDir>/<queryName>_<suffix>.txt per matched query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <queries...>")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val wanted = args.drop(3)
    val spark = GraftSession.get()
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.exists(name.contains)) {
        spark.catalog.clearCache()
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
      }
    }
    spark.stop()
  }
}
