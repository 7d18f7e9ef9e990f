package graft.streaming

import graft.SparkSpecBase
import graft.operators.ChunkDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Ingest-time CDC rewrite contracts (the content-defined counterpart
  * of StreamChunkRewriteSpec): indexed fingerprints cut out of arriving
  * documents, novel text passes verbatim, within-doc repeats drop
  * statelessly, streaming ≡ batch on the same operator, streaming a
  * delta ≡ the batch cdcRewrite of corpus ∪ delta restricted to the
  * delta — PLUS the property that motivates CDC at ingest: a re-crawl
  * with a small leading edit still dedupes everything past the boundary
  * resync, where the fixed token grid keeps the whole re-keyed tail.
  */
class StreamCdcRewriteSpec extends SparkSpecBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val tPush = Timestamp.valueOf("2026-01-01 12:00:00")
  private val pushId = 99999L

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def corpusText(id: Long): String =
    corpus.filter(col("doc_id") === id).select("text").collect()(0).getString(0)

  test("indexed CDC chunks are cut out; novel text passes verbatim; " +
    "in-doc repeats drop statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val index = ChunkDedup.cdcChunkIndex(corpus, "text").cache()
    val known = corpusText(3L)
    val novel = (1 to 25).map(i => s"zz$i").mkString(" ")
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.streamingCdcRewrite(
        input.toDF().toDF("doc_id", "text", "event_time"), index)
      .writeStream.format("memory").queryName("cdcrw")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (10001L, known, t0),           // verbatim re-crawl: all chunks indexed
        (10002L, novel, t0),           // novel: survives whole
        (10003L, known + known, t0)))  // doc 3 twice: second copy's chunks
                                       // repeat in-doc (after resync) or hit
                                       // the index — only novel seam text
                                       // could survive, and it must be short
      q.processAllAvailable()
      input.addData(Seq((pushId, "wm push", tPush)))
      q.processAllAvailable()
      val rows = spark.table("cdcrw").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_kept"), r.getAs[String]("cleaned"))).toMap
      assert(rows(10001L)._1 == 0L && rows(10001L)._2 == "",
        s"re-crawled chunks not cut: ${rows(10001L)}")
      assert(rows(10002L)._2 == novel, s"novel doc mangled: ${rows(10002L)}")
      // the doubled doc keeps at most the seam chunk (boundary straddling
      // the join point); everything else is an exact repeat
      assert(rows(10003L)._2.length < known.length / 2,
        s"doubled doc did not dedupe: kept ${rows(10003L)._2.length} chars")
    } finally q.stop()
  }

  test("streaming result equals the batch run of the same operator") {
    implicit val sqlCtx = spark.sqlContext
    val index = ChunkDedup.cdcChunkIndex(corpus, "text").cache()
    val probes = Seq(
      (90001L, corpusText(5L), t0),
      (90002L, corpusText(17L) + " unique tail token", t0),
      (90003L, (1 to 30).map(i => s"nn$i").mkString(" "), t0))
    val batchRows = StreamOps.streamingCdcRewrite(
        probes.toDF("doc_id", "text", "event_time"), index)
      .collect().map(_.toString).sorted
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.streamingCdcRewrite(
        input.toDF().toDF("doc_id", "text", "event_time"), index)
      .writeStream.format("memory").queryName("cdcrw_eq")
      .outputMode("append").start()
    try {
      input.addData(probes)
      q.processAllAvailable()
      input.addData(Seq((pushId, "wm push", tPush)))
      q.processAllAvailable()
      val streamRows = spark.table("cdcrw_eq")
        .filter(col("doc_id") =!= pushId)
        .collect().map(_.toString).sorted
      assert(streamRows.nonEmpty && streamRows.sameElements(batchRows),
        s"stream/batch divergence:\nstream=${streamRows.mkString(";")}\n" +
          s"batch=${batchRows.mkString(";")}")
    } finally q.stop()
  }

  test("streaming a delta == batch cdcRewrite of corpus ∪ delta, " +
    "restricted to the delta") {
    implicit val sqlCtx = spark.sqlContext
    val index = ChunkDedup.cdcChunkIndex(corpus, "text").cache()
    val delta = Seq(
      (91001L, corpusText(3L)),
      (91002L, (1 to 45).map(i => s"mm$i").mkString(" ")))
    val streamed = StreamOps.streamingCdcRewrite(
        delta.map { case (i, t) => (i, t, t0) }
          .toDF("doc_id", "text", "event_time"),
        index)
      .select("doc_id", "n_chunks", "n_kept", "cleaned")
      .collect().map(_.toString).sorted
    val composed = ChunkDedup.cdcRewrite(
        corpus.unionByName(delta.toDF("doc_id", "text")), "doc_id", "text")
      .filter(col("doc_id") >= 91001L)
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(composed),
      s"composition divergence:\nstream=${streamed.mkString(";")}\n" +
        s"batch=${composed.mkString(";")}")
  }

  test("edit robustness at ingest: a re-crawl with a leading edit still " +
    "dedupes past the boundary resync (the CDC motivation)") {
    implicit val sqlCtx = spark.sqlContext
    val index = ChunkDedup.cdcChunkIndex(corpus, "text").cache()
    val orig = corpusText(7L)
    val edited = "EDIT " + orig
    val kept = StreamOps.streamingCdcRewrite(
        Seq((95001L, edited, t0)).toDF("doc_id", "text", "event_time"), index)
      .select("n_kept", "n_chunks", "cleaned").collect()(0)
    // only the chunks before the first resync boundary can survive; the
    // tail (most of the document) must hit the index
    assert(kept.getAs[String]("cleaned").length < edited.length / 2,
      s"edited re-crawl kept ${kept.getAs[String]("cleaned").length} of " +
        s"${edited.length} chars — tail did not dedupe")
    assert(kept.getAs[Long]("n_kept") < kept.getAs[Long]("n_chunks"))
  }
}
