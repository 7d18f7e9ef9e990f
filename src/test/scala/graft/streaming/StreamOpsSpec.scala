package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamingFold aggregates tumbling-window phase profiles incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val folded = StreamOps.streamingFold(
      input.toDF().toDF("ts", "v"), "ts", "v",
      t0EpochSec = 0.0, periodSec = 2.0, nbins = 4, dumpSeconds = 60)
    val q = folded.writeStream.format("memory")
      .queryName("folded").outputMode("append").start()
    try {
      // period 2 s, 4 bins → bin = (t mod 2) * 2; feed two dumps' worth
      def ts(s: Long) = new Timestamp(s * 1000)
      input.addData(Seq(
        (ts(10), 1.0), (ts(11), 5.0), (ts(12), 2.0), (ts(13), 6.0),
        (ts(70), 10.0), (ts(71), 20.0)))
      q.processAllAvailable()
      // advance the watermark far enough to close both windows
      input.addData(Seq((ts(500), 0.0)))
      q.processAllAvailable()
      val rows = spark.table("folded")
        .select($"dump_start", $"ibin", $"n", $"total")
        .as[(Timestamp, Int, Long, Double)].collect()
        .map(r => (r._1.getTime / 1000, r._2, r._3, r._4)).toSet
      // window [0,60): even seconds → bin 0 (1+2), odd seconds → bin 2 (5+6)
      assert(rows.contains((0L, 0, 2L, 3.0)), s"got $rows")
      assert(rows.contains((0L, 2, 2L, 11.0)), s"got $rows")
      // window [60,120): 10 at bin 0, 20 at bin 2
      assert(rows.contains((60L, 0, 1L, 10.0)))
      assert(rows.contains((60L, 2, 1L, 20.0)))
    } finally q.stop()
  }

  test("pulseCountFold dumps every N pulses (batch form)") {
    val df = (0L until 100L).map(i => (i, (i % 8).toInt, 1.0))
      .toDF("pulse", "bin", "v")
    val out = StreamOps.pulseCountFold(df, "pulse", "bin", "v", 50)
      .groupBy($"dump").agg(sum($"n").as("total"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 50L, 1L -> 50L))
  }

  test("stagingDrain emits each terminal url once and routes failures") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-drain")
    val completed = dir.resolve("completed").toString
    val dlq = dir.resolve("dlq").toString
    val input = MemoryStream[(String, String, Timestamp)]
    val drained = StreamOps.stagingDrain(
      input.toDF().toDF("url", "status", "event_time"))
    val q = drained.writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.drainBatch(b, completed, dlq))
      .outputMode("append").start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      // u1 staged→ready; u2 fails; u1 re-reported ready (poll repeats)
      input.addData(Seq(("u1", "staged", ts(1)), ("u1", "ready", ts(2)),
        ("u2", "failed", ts(3))))
      q.processAllAvailable()
      input.addData(Seq(("u1", "ready", ts(4)), ("u3", "ready", ts(5))))
      q.processAllAvailable()
      val done = spark.read.parquet(completed).select($"url").as[String].collect()
      assert(done.sorted.toSeq == Seq("u1", "u3"), "each ready url exactly once")
      val failed = spark.read.parquet(dlq).select($"url").as[String].collect()
      assert(failed.toSeq == Seq("u2"))
    } finally q.stop()
  }

  test("statefulDrain counts retries per url across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{DrainAction, StagingEvent}
    val input = MemoryStream[StagingEvent]
    val drained = StreamOps.statefulDrain(input.toDS(), maxRetries = 2)
    val q = drained.writeStream.format("memory")
      .queryName("sdrain").outputMode("append").start()
    try {
      def ev(u: String, s: String, t: Long) =
        StagingEvent(u, s, new Timestamp(t * 1000))
      // batch 1: u1 fails once (retry #1); u2 ready (retrieve)
      input.addData(ev("u1", "failed", 1), ev("u2", "ready", 2))
      q.processAllAvailable()
      // batch 2: u1 fails again → attempts reach 2 → dead; u2 re-reported
      // ready (ignored — terminal state is a kept tombstone, so NO second
      // retrieve row); u3 progress tick (no action)
      input.addData(ev("u1", "failed", 3), ev("u2", "ready", 4),
        ev("u3", "staged", 5))
      q.processAllAvailable()
      // batch 3: u1 fails after dead — must NOT resurrect retries
      input.addData(ev("u1", "failed", 6), ev("u2", "ready", 7))
      q.processAllAvailable()
      // compare as a sorted SEQ, not a set — a duplicate retrieve row is
      // exactly the regression this test exists to catch
      val got = spark.table("sdrain").as[DrainAction].collect()
        .sortBy(a => (a.url, a.action)).toSeq
      assert(got == Seq(
        DrainAction("u1", "dead", 2),
        DrainAction("u1", "retry", 1),
        DrainAction("u2", "retrieve", 0)), s"got $got")
    } finally q.stop()
  }

  test("streamingDocIngest dedups re-crawled content by portable fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.streamingDocIngest(
      input.toDF().toDF("event_time", "doc_id", "text"))
    val q = out.writeStream.format("memory")
      .queryName("ingest").outputMode("append").start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      input.addData(Seq(
        (ts(10), 1L, "the quick fox"),
        (ts(11), 2L, "a slow dog"),
        (ts(12), 3L, "the quick fox"))) // re-crawl of doc 1's content
      q.processAllAvailable()
      input.addData(Seq((ts(20), 4L, "the quick fox"))) // still within watermark
      q.processAllAvailable()
      val rows = spark.table("ingest")
        .select($"doc_id", $"fingerprint", $"n_tokens")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(1L, 2L), s"got ${rows.toSeq}")
      // fingerprint matches the batch-path hash (one dedup key everywhere)
      val batchHash = spark.range(1)
        .select(graft.functions.TextFunctions.strHash(lit("the quick fox")))
        .as[Long].head()
      assert(rows.find(_._1 == 1L).get._2 == batchHash)
      assert(rows.find(_._1 == 1L).get._3 == 3L)
    } finally q.stop()
  }

  test("streamingCurate gates quality before the dedup state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.streamingCurate(
      input.toDF().toDF("event_time", "doc_id", "text"), minQuality = 1.0)
    val q = out.writeStream.format("memory")
      .queryName("scurate").outputMode("append").start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      input.addData(Seq(
        (ts(10), 1L, "catalyst rewrites logical plans before execution"),
        (ts(11), 2L, "the the the the the !!! ;;; ..."), // junk: fails quality
        (ts(12), 3L, "catalyst rewrites logical plans before execution"))) // dup of 1
      q.processAllAvailable()
      val rows = spark.table("scurate")
        .select($"doc_id", $"quality").as[(Long, Double)].collect().sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(1L), s"got ${rows.toSeq}")
      // the streaming score IS the batch score — one quality definition
      val batchQ = {
        import graft.functions.TextFunctions._
        val (nT, sL, nS, nP) = qualityCounters(col("tk"), col("text"))
        spark.createDataset(Seq("catalyst rewrites logical plans before execution"))
          .toDF("text").withColumn("tk", tokens(col("text")))
          .select(qualityScore(nT, sL, nS, nP)).as[Double].head()
      }
      assert(rows.head._2 == batchQ)
    } finally q.stop()
  }
}
