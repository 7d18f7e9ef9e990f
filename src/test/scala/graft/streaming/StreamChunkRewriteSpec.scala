package graft.streaming

import graft.SparkSpecBase
import graft.operators.ChunkDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Ingest-time chunk dedup contracts: a chunk already in the corpus
  * index is cut out of an arriving document (and the document
  * re-assembles around it), novel text passes through verbatim,
  * within-doc repeats drop statelessly, the streaming plan computes
  * exactly what the same operator computes in batch, and — the
  * composition statement — streaming a delta against the corpus index
  * matches the BATCH rewrite of corpus ∪ delta restricted to the delta
  * (valid when delta docs don't share chunks among themselves: cross-
  * stream repeats are the daily batch run's job, the streamingNearDup
  * contract).
  */
class StreamChunkRewriteSpec extends SparkSpecBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  // append-mode groups finalize when the watermark PASSES their event
  // time, which happens in a LATER micro-batch — push it with a sentinel
  private val tPush = Timestamp.valueOf("2026-01-01 12:00:00")
  private val pushId = 99999L

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def corpusText(id: Long): String =
    corpus.filter(col("doc_id") === id).select("text").collect()(0).getString(0)

  test("indexed chunks are cut out; novel text passes verbatim; in-doc repeats drop") {
    implicit val sqlCtx = spark.sqlContext
    val index = ChunkDedup.chunkIndex(corpus, "text").cache()
    val known = corpusText(3L)
    val novel = (1 to 25).map(i => s"zz$i").mkString(" ") // 25 novel tokens
    val block = (1 to 20).map(i => s"rep$i").mkString(" ") // exactly one chunk
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.streamingChunkRewrite(
        input.toDF().toDF("doc_id", "text", "event_time"), index)
      .writeStream.format("memory").queryName("chunkrw")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (10001L, known, t0),                  // verbatim re-crawl: all chunks indexed
        (10002L, novel, t0),                  // novel: survives whole
        (10003L, s"$block $block", t0)))      // same chunk twice in one doc
      q.processAllAvailable()
      input.addData(Seq((pushId, "wm push", tPush)))
      q.processAllAvailable()
      val rows = spark.table("chunkrw").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_kept"), r.getAs[String]("cleaned"))).toMap
      assert(rows(10001L)._1 == 0L && rows(10001L)._2 == "",
        s"re-crawled chunks not cut: ${rows(10001L)}")
      assert(rows(10002L) == (2L -> novel),
        s"novel doc mangled: ${rows(10002L)}")
      assert(rows(10003L) == (1L -> block),
        s"in-doc repeat not dropped statelessly: ${rows(10003L)}")
    } finally q.stop()
  }

  test("streaming result equals the batch run of the same operator") {
    implicit val sqlCtx = spark.sqlContext
    val index = ChunkDedup.chunkIndex(corpus, "text").cache()
    val probes = Seq(
      (90001L, corpusText(5L), t0),
      (90002L, corpusText(17L) + " unique tail token", t0),
      (90003L, (1 to 30).map(i => s"nn$i").mkString(" "), t0))
    val batchRows = StreamOps.streamingChunkRewrite(
        probes.toDF("doc_id", "text", "event_time"), index)
      .collect().map(_.toString).sorted
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.streamingChunkRewrite(
        input.toDF().toDF("doc_id", "text", "event_time"), index)
      .writeStream.format("memory").queryName("chunkrw_eq")
      .outputMode("append").start()
    try {
      input.addData(probes)
      q.processAllAvailable()
      input.addData(Seq((pushId, "wm push", tPush)))
      q.processAllAvailable()
      val streamRows = spark.table("chunkrw_eq")
        .filter(col("doc_id") =!= pushId)
        .collect().map(_.toString).sorted
      assert(streamRows.nonEmpty && streamRows.sameElements(batchRows),
        s"stream/batch divergence:\nstream=${streamRows.mkString(";")}\nbatch=${batchRows.mkString(";")}")
    } finally q.stop()
  }

  test("streaming a delta == batch rewrite of corpus ∪ delta, restricted to the delta") {
    implicit val sqlCtx = spark.sqlContext
    val index = ChunkDedup.chunkIndex(corpus, "text").cache()
    // delta: one full re-crawl, one partial overlap (first chunk of doc 5
    // + unique tail), one novel doc — pairwise chunk-disjoint
    val head20 = corpusText(5L).split(" ").filter(_.nonEmpty).take(20).mkString(" ")
    val delta = Seq(
      (91001L, corpusText(3L)),
      (91002L, head20 + " " + (1 to 7).map(i => s"tail$i").mkString(" ")),
      (91003L, (1 to 45).map(i => s"mm$i").mkString(" ")))
    val streamed = StreamOps.streamingChunkRewrite(
        delta.map { case (i, t) => (i, t, t0) }.toDF("doc_id", "text", "event_time"),
        index)
      .select("doc_id", "n_chunks", "n_kept", "cleaned")
      .collect().map(_.toString).sorted
    val composed = ChunkDedup.rewrite(
        corpus.unionByName(delta.toDF("doc_id", "text")), "doc_id", "text")
      .filter(col("doc_id") >= 91001L)
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(composed),
      s"composition divergence:\nstream=${streamed.mkString(";")}\nbatch=${composed.mkString(";")}")
  }
}
