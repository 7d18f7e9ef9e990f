package graft

/** Ad-hoc diagnostic main for iterating on hot queries (not part of the
  * driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val lnVals = Seq(1.5, 2.0, 3.7, 123.456, 0.001, 9.999999, 54321.123, 7.25e8, 1e-9, 2.718281828)
    println("lnbits=" + lnVals.map(v => java.lang.Double.doubleToLongBits(math.log(v))).mkString(","))
    if (args.contains("lnonly")) return
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        array_distinct(transform(array_distinct(tokens(col("text"))), strHash(_)))
          .as("toks"))
    val t0 = System.nanoTime()
    val stats = docs.agg(count(lit(1)), avg(size(col("toks"))), max(size(col("toks")))).collect()(0)
    println(s"docs=${stats.getLong(0)} avgToks=${stats.getDouble(1)} maxToks=${stats.getInt(2)} in ${(System.nanoTime()-t0)/1e9}s")
    val res = SparkEntry.queries("q32_lsh_neardup_pairs")(spark, d)
    val t1 = System.nanoTime()
    println(s"q32 rows=${res.count()} in ${(System.nanoTime()-t1)/1e9}s")
    val t2 = System.nanoTime()
    println(s"q32 again rows=${res.count()} in ${(System.nanoTime()-t2)/1e9}s")
    spark.stop()
  }
}
