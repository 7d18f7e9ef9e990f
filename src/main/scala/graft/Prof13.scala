package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement tool (round 13): per-stage wall timing of the curation
  * family's shared pipeline, guide §1 discipline — noop sink so the
  * computation is timed, not the sink; labeled jobs; each stage timed
  * from a cold cache so the split is honest.
  *
  * Usage: runMain graft.Prof13 <sfDir> [stages...]
  */
object Prof13 {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = args.drop(1).toSet
    def want(s: String) = which.isEmpty || which.contains(s)
    val spark = GraftSession.get()
    import graft.pipelines.Curation
    import graft.functions.TextFunctions._

    def timed(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }

    val docs = Tables.documents(spark, sfDir)
    val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val cfg = Curation.Config(minQuality = 2.95)

    if (want("tokenize"))
      timed("tokenize+hash only") {
        noop(docs.select(col("doc_id"),
          array_sort(array_distinct(transform(array_distinct(tokens(col("text"))), strHash(_))))
            .as("toks")))
      }
    if (want("score")) {
      timed("score: quality+shingles+overlap") {
        // replicate Curation.score inline (it is private)
        val (nTokens, sumLen, nStop, nPunct) = qualityCounters(col("tk"), col("text"))
        val benchSh = bench
          .select(tokens(col("text")).as("tk"))
          .select(explode(wordShingles(col("tk"), 3)).as("h")).distinct()
        val withSh = docs
          .withColumn("tk", tokens(col("text")))
          .withColumn("quality", qualityScore(nTokens, sumLen, nStop, nPunct))
          .withColumn("sh", wordShingles(col("tk"), 3))
          .drop("tk")
        val overlapped = withSh
          .crossJoin(broadcast(benchSh.agg(array_sort(collect_set(col("h"))).as("bench_sh"))))
          .withColumn("n_overlap",
            call_function("sorted_intersect_count", col("sh"), col("bench_sh")))
        noop(overlapped.drop("sh", "bench_sh"))
      }
    }
    if (want("pairs"))
      timed("lsh pairs over candidates") {
        // approximates the candidate set with the quality+contam filter result
        val (pairs, rel) = graft.queries.SimilarityQ
          .lshNearDupPairsScoped(docs.select(col("doc_id"), col("text")),
            hinted = cfg.broadcastPairDims, threshold = cfg.jaccardThreshold)
        noop(pairs)
        rel()
      }
    if (want("curate"))
      timed("curate full (noop)") {
        noop(Curation.curate(docs, bench, cfg))
      }
    if (want("q136"))
      timed("q136 shape: curate+forget") {
        val prev = Curation.curate(docs, bench, cfg)
        val victims = docs.filter(col("doc_id") % 31 === 1).select("doc_id")
        noop(Curation.forget(prev, victims, docs, cfg))
      }
    if (want("q136chk"))
      timed("q136chk: checkpointed prev") {
        val prev = Curation.curate(docs, bench, cfg)
          .select(Curation.DecisionCols.map(col): _*).localCheckpoint(true)
        val victims = docs.filter(col("doc_id") % 31 === 1).select("doc_id")
        noop(Curation.forget(prev, victims, docs, cfg))
      }
    if (want("canon")) {
      // isolate keepBest (canonicalize + window) from pair generation
      val quality = {
        val (nTokens, sumLen, nStop, nPunct) = qualityCounters(col("tk"), col("text"))
        docs.withColumn("tk", tokens(col("text")))
          .withColumn("quality", qualityScore(nTokens, sumLen, nStop, nPunct))
          .select(col("doc_id"), col("quality"), col("text"))
      }
      val (pairsRaw, rel) = graft.queries.SimilarityQ
        .lshNearDupPairsScoped(quality.select(col("doc_id"), col("text")),
          hinted = cfg.broadcastPairDims, threshold = cfg.jaccardThreshold)
      val pairs = pairsRaw.select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      val quals = quality.select(col("doc_id"), col("quality")).localCheckpoint(true)
      rel()
      println(s"  pairs=${pairs.count()} docs=${quals.count()}")
      timed("keepBest only") {
        noop(graft.operators.DedupGroups
          .keepBest(quals, "doc_id", "quality", pairs, "doc_a", "doc_b"))
      }
      // canonicalize inline, per-step timers
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"  CANONSTEP $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      val p = t("p checkpoint") {
        pairs.select(col("doc_a").as("a"), col("doc_b").as("b")).localCheckpoint()
      }
      val label0 = t("label0") {
        p.select(col("a").as("id"), col("b").as("nbr"))
          .union(p.select(col("b").as("id"), col("a").as("nbr")))
          .groupBy(col("id")).agg(min(col("nbr")).as("nbr"))
          .select(col("id"), least(col("id"), col("nbr")).as("label"))
          .localCheckpoint()
      }
      val contracted = t("contract") {
        p.join(broadcast(label0.select(col("id").as("a"), col("label").as("la"))), "a")
          .join(broadcast(label0.select(col("id").as("b"), col("label").as("lb"))), "b")
          .select(col("la").as("src"), col("lb").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
      }
      val edges = t("edges checkpoint") {
        contracted.union(contracted.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint()
      }
      println(s"  contracted edges=${edges.count()}")
      var verts = t("verts0") {
        edges.select(col("src").as("id")).distinct()
          .withColumn("label", col("id"))
          .localCheckpoint()
      }
      var changed = 1L
      var i = 0
      while (changed > 0 && i < 50) {
        val updated = t(s"round $i checkpoint") {
          val nbrMin = edges.join(verts, edges("dst") === verts("id"))
            .groupBy(col("src")).agg(min(col("label")).as("nbr"))
            .select(col("src").as("id"), col("nbr"))
          verts.join(nbrMin, Seq("id"), "left")
            .select(col("id"), col("label"),
              least(col("label"), coalesce(col("nbr"), col("label"))).as("next"))
            .localCheckpoint()
        }
        changed = t(s"round $i count") {
          updated.filter(col("next") =!= col("label")).count()
        }
        verts = updated.select(col("id"), col("next").as("label"))
        i += 1
      }
      val canon = t("compose") {
        label0.join(verts.select(col("id").as("label"), col("label").as("canon")),
          Seq("label"), "left")
          .select(col("id").as("doc_id"),
            coalesce(col("canon"), col("label")).as("canonical_id"))
      }
      t("window+noop") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))
          .orderBy(col("quality").desc, col("doc_id").asc)
        noop(quals.join(canon.withColumnRenamed("doc_id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("component", coalesce(col("canonical_id"), col("doc_id")))
          .drop("canonical_id")
          .withColumn("keep", row_number().over(w) === 1))
      }
    }
    spark.stop()
  }
}
