package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen path once with a FIXED cheap query so per-query
    // times measure execution, not first-use classloading — and so no
    // timed query gets an accidental warm cache from the warmup.
    try SparkEntry.queries("q09_catalog_totals")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Optional args: query-name substrings to run a subset while iterating.
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(n.contains)
    }
    val results = wanted.map { case (name, fn) =>
      // Each query measured standalone: no cached data carried across
      // queries (intra-query .cache() calls still work as designed).
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver parses the bench JSON from output where sbt may append its
    // own trailer lines; persist to a file AND print after spark.stop() so
    // the JSON is the program's last stdout line.
    val outPath = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath, json.getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
