package graft.pipelines

import org.apache.spark.sql.functions._

/** Scratch profiler for the curate DAG at sf0.1 — not a test. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.Tables.documents(spark, d)
    val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    // warm
    docs.count(); bench.count()
    val full = t("curate construct (eager CC)") {
      Curation.curate(docs, bench, Curation.Config(minQuality = 2.95))
    }
    t("curate count")(full.count())
    // pieces
    val scored = t("scored only") {
      val (nTokens, sumLen, nStop, nPunct) =
        graft.functions.TextFunctions.qualityCounters(col("tk"), col("text"))
      val benchArr = bench
        .select(graft.functions.TextFunctions.tokens(col("text")).as("tk"))
        .select(explode(graft.functions.TextFunctions.wordShingles3(col("tk"))).as("h")).distinct()
        .agg(array_sort(collect_set(col("h"))).as("bench_sh"))
      val s2 = docs
        .withColumn("tk", graft.functions.TextFunctions.tokens(col("text")))
        .withColumn("quality", graft.functions.TextFunctions.qualityScore(nTokens, sumLen, nStop, nPunct))
        .withColumn("sh", graft.functions.TextFunctions.wordShingles3(col("tk")))
        .drop("tk")
        .crossJoin(broadcast(benchArr))
        .withColumn("n_overlap",
          call_function("sorted_intersect_count", col("sh"), col("bench_sh")))
        .drop("sh", "bench_sh")
      s2.count()
      s2
    }
    val cand = docs.select(col("doc_id"), col("text")) // stand-in: full corpus
    val pairs = t("lsh pairs over corpus") {
      val p = graft.queries.SimilarityQ.lshNearDupPairsFrom(cand, hinted = true)
        .filter(col("jaccard") >= 0.5)
      p.count()
      p
    }
    t("canonicalize") {
      graft.operators.DedupGroups.canonicalize(pairs, "doc_a", "doc_b").count()
    }
    // round-by-round replica of the canonicalize loop
    println(s"[prof] n_pairs = ${pairs.count()}")
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().localCheckpoint()
    println(s"[prof] n_edges = ${edges.count()}  n_verts = ${edges.select(col("src")).distinct().count()}")
    var verts = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < 50) {
      val t0 = System.nanoTime()
      val nbrMin = edges.join(verts, edges("dst") === verts("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr"))
        .select(col("src").as("id"), col("nbr"))
      val updated = verts.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("next"))
        .localCheckpoint()
      changed = updated.filter(col("next") =!= col("label")).count()
      verts = updated.select(col("id"), col("next").as("label"))
      i += 1
      println(f"[prof] round $i%2d changed=$changed%6d  ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
