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
    // q33/q62 breakdown
    var t = System.nanoTime()
    println(s"q33 rows=${SparkEntry.queries("q33_simhash")(spark, d).count()} in ${(System.nanoTime()-t)/1e9}s")
    spark.catalog.clearCache()
    val q62df = SparkEntry.queries("q62_simhash_neardup")(spark, d)
    t = System.nanoTime()
    println(s"q62 rows=${q62df.count()} in ${(System.nanoTime()-t)/1e9}s")
    t = System.nanoTime()
    println(s"q62 again rows=${q62df.count()} in ${(System.nanoTime()-t)/1e9}s")
    spark.catalog.clearCache()
    // q31 signature alone
    t = System.nanoTime()
    println(s"q31 rows=${SparkEntry.queries("q31_minhash_signature")(spark, d).count()} in ${(System.nanoTime()-t)/1e9}s")
    spark.catalog.clearCache()
    val res = SparkEntry.queries("q32_lsh_neardup_pairs")(spark, d)
    t = System.nanoTime()
    println(s"q32 rows=${res.count()} in ${(System.nanoTime()-t)/1e9}s")
    t = System.nanoTime()
    println(s"q32 again rows=${res.count()} in ${(System.nanoTime()-t)/1e9}s")
    // stage timing: candidate pairs only (no verify)
    import graft.functions.TextFunctions._
    val P = HashMod
    val docs2 = Tables.documents(spark, d)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(array_distinct(tokens(col("text"))), strHash(_))))
          .as("toks"))
      .withColumn("n", size(col("toks")).cast("long")).cache()
    def mh(k: Int) = array_min(transform(col("toks"),
      x => (lit(MinhashA(k)) * x + lit(MinhashB(k))) % P))
    def bucket(b: Int) = {
      val ks = (4 * b until 4 * b + 4).map(mh)
      (((ks(0) * 31L + ks(1) % P) % P * 31L + ks(2) % P) % P * 31L + ks(3) % P)
    }
    val sigv2 = docs2.select(col("doc_id"), col("n"),
        array((0 until 2).map(bucket): _*).as("buckets"))
      .select(col("doc_id"), col("n"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band", "bucket"))).cache()
    t = System.nanoTime(); println(s"sigv2 rows=${sigv2.count()} in ${(System.nanoTime()-t)/1e9}s")
    def bandEq(b: Int) = element_at(col("x.buckets"), b + 1) === element_at(col("y.buckets"), b + 1)
    val cand2 = sigv2.as("x").join(broadcast(sigv2.as("y")),
      col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id") &&
        least(col("x.n"), col("y.n")) * 2 >= greatest(col("x.n"), col("y.n")) &&
        !(col("x.band") > 0 && bandEq(0)))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    t = System.nanoTime(); println(s"cand2 rows=${cand2.count()} in ${(System.nanoTime()-t)/1e9}s")
    t = System.nanoTime(); println(s"cand2 again rows=${cand2.count()} in ${(System.nanoTime()-t)/1e9}s")
    spark.stop()
  }
}
