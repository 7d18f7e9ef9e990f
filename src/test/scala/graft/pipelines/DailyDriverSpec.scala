package graft.pipelines

import graft.SparkSpecBase
import graft.streaming.StreamOps
import graft.operators.{KMeans, VecIndex}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** The DAILY DRIVER, composed: the three individually-proven pieces a
  * corpus owner actually chains — streaming ingest with the quality
  * pre-gate and fingerprint dedup (`streamingCurate`), vector-index
  * maintenance (`VecIndex.appendStream` + `compact`), and the
  * incremental decision-table update (`curateIncremental` over
  * storage-persisted prev/prevIndex) — run as ONE flow at sf0.01 and
  * held to the golden equivalence: the day's decision table must equal
  * a full `curate` rerun over the unioned corpus, row for row.
  *
  * The ingest gate is a LOOSER junk cutoff (minQuality = 1.0) than the
  * curation bar (2.95), as in production: the stream drops only
  * obvious junk and re-crawls; the batch pipeline then applies the
  * real policy, so both quality verdicts still occur downstream.
  */
class DailyDriverSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.01"
  private val cfg = Curation.Config(minQuality = 2.95)
  private val ingestBar = 1.0

  test("stream-ingested delta + incremental run equals the full rerun golden") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = docs.filter(col("doc_id") % 4 =!= 0)
    val bRaw = docs.filter(col("doc_id") % 4 === 0)
    val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")

    // ---- day 0: full run, outputs persisted to storage (the
    // production handoff — curateIncremental reads parquet, not plans)
    val day0 = tempDir("daily-prev")
    Curation.curate(a, bench, cfg).select(Curation.DecisionCols.map(col): _*)
      .write.parquet(s"$day0/decisions")
    val prev0 = spark.read.parquet(s"$day0/decisions")
    StreamOps.signatureIndex(
        a.join(prev0.filter(col("quality_pass") && col("contam_pass"))
          .select("doc_id"), Seq("doc_id")))
      .write.parquet(s"$day0/sig_index")
    val prev = spark.read.parquet(s"$day0/decisions")
    val prevIndex = spark.read.parquet(s"$day0/sig_index")

    // ---- day 1 arrivals: today's docs in two micro-batches, plus
    // re-crawls (same text, shifted id) that ingest dedup must drop
    val arrivals = bRaw.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val recrawls = arrivals.take(10).map { case (id, t) => (id + 10000000L, t) }
    // crawler junk the ingest gate must drop (the sf corpus has no
    // natural sub-1.0 docs, so the gate needs synthetic spam to bite)
    val junk = (0 until 5).map(i =>
      (20000000L + i, "the the the the the !!! ;;; ... " * (i + 1))).toArray
    def ts(i: Int) = new Timestamp(1000L * (100 + i))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Long, String)]
    val ingested = StreamOps.streamingCurate(
      input.toDF().toDF("event_time", "doc_id", "text"), minQuality = ingestBar)
    val q = ingested.writeStream.format("memory")
      .queryName("daily_ingest").outputMode("append").start()
    try {
      val (h1, h2) = arrivals.splitAt(arrivals.length / 2)
      input.addData(h1.zipWithIndex.map { case ((id, t), i) => (ts(i), id, t) })
      q.processAllAvailable()
      input.addData((h2 ++ recrawls ++ junk).zipWithIndex.map { case ((id, t), i) =>
        (ts(1000 + i), id, t)
      })
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.table("daily_ingest").select("doc_id", "text")
      .localCheckpoint(true) // pin: the memory table dies with the query

    // the gate did something: every junk doc dropped, every re-crawl
    // deduped, every legitimate arrival kept
    assert(accepted.count() == arrivals.length,
      "ingest gate dropped a legitimate arrival or passed junk")
    assert(accepted.filter(col("doc_id") >= 10000000L).count() == 0,
      "a re-crawl or junk doc survived the ingest gate")

    // ---- day 1 index leg: stream the day's embeddings into the
    // persisted vector index, compact, and prove search still prunes
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb.filter(col("vec_id") % 4 =!= 0),
      "vec_id", "embedding", k = 4, iters = 1)
    val idxDir = tempDir("daily-vecindex")
    VecIndex.build(emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
      cents, idxDir)
    val nIdx0 = VecIndex.open(spark, idxDir).count()
    val embIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val eq = VecIndex.appendStream(embIn.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, idxDir, tempDir("daily-vecindex-ckpt"))
    try {
      embIn.addData(emb.filter(col("vec_id") % 4 === 0).limit(64)
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect())
      eq.processAllAvailable()
    } finally eq.stop()
    VecIndex.compact(spark, idxDir, "vec_id")
    val idx = VecIndex.open(spark, idxDir)
    assert(idx.count() > nIdx0, "appended vectors missing from the index")
    val probes = idx.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val sPlan = VecIndex.search(idx, probes, "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("PartitionFilters") && !sPlan.contains("PartitionFilters: []"),
      "post-compaction search lost partition pruning")

    // ---- day 1 decision update vs the golden full rerun
    val incremental = Curation.curateIncremental(prev, prevIndex, accepted, bench, cfg)
    val golden = Curation.curate(a.select("doc_id", "text").unionByName(accepted),
        bench, cfg)
      .select(Curation.DecisionCols.map(col): _*)
    def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.select(Curation.DecisionCols.map(col): _*)
        .collect().map(_.toString).sorted
    val got = canon(incremental)
    val want = canon(golden)
    assert(got.length == want.length,
      s"row count ${got.length} vs golden ${want.length}")
    assert(got.sameElements(want), "incremental daily run diverged from full rerun")

    // non-vacuity: the delta contributed both verdict kinds, and at
    // least one near-dup component spans the day boundary
    val newRows = incremental.join(accepted.select("doc_id"), Seq("doc_id"))
    assert(newRows.filter(col("keep")).count() > 0, "no new doc kept")
    assert(newRows.filter(!col("keep")).count() > 0, "no new doc rejected")
    val spanning = incremental.join(accepted.select("doc_id"), Seq("doc_id"))
      .select(col("component")).distinct()
      .join(prev.filter(col("quality_pass") && col("contam_pass"))
        .select(col("component")).distinct(), Seq("component"))
    assert(spanning.count() > 0, "no component spans the day boundary — equivalence is weak")
  }
}
