package graft

/** Ad-hoc diagnostic main (not part of the driver contract): prints the
  * executed physical plan of the named registry queries after a real run,
  * so AQE-final join strategies and codegen spans are visible —
  * `runMain graft.Probe q69 q70` etc. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.contains("--sf001")) "/root/testdata/sf0.01" else "/root/testdata/sf0.1"
    val names = graft.queries.Registry.all.map(_.name)
      .filter(n => args.exists(n.contains))
    for (n <- names) {
      spark.catalog.clearCache()
      if (args.contains("--warm")) { // JIT/codegen warm pass, then re-plan cold
        graft.queries.Registry.byName(n).run(spark, d).count()
        spark.catalog.clearCache()
      }
      val df = graft.queries.Registry.byName(n).run(spark, d)
      val t0 = System.nanoTime()
      val cnt = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val exec0 = df.queryExecution.executedPlan
      val exec = exec0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      println(s"===== $n rows=$cnt time=${f"$secs%.2f"}s =====")
      println(exec.toString)
    }
    spark.stop()
  }
}
