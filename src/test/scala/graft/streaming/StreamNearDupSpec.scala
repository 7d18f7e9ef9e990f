package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dedup-on-ingest contracts: a verbatim re-crawl is flagged against the
  * persisted signature index with jaccard 1.0, novel text passes clean,
  * and the streaming plan computes exactly what the same operator
  * computes in batch (stream-static joins reuse one definition).
  */
class StreamNearDupSpec extends SparkSpecBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("re-crawled text is flagged against the index; novel text is not") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val index = StreamOps.signatureIndex(corpus).cache()
    val known = corpus.filter(col("doc_id") === 3L)
      .select(col("text")).collect()(0).getString(0)
    val input = MemoryStream[(Long, String)]
    val out = StreamOps.streamingNearDup(
      input.toDF().toDF("doc_id", "text"), index)
    val q = out.writeStream.format("memory")
      .queryName("neardup").outputMode("append").start()
    try {
      input.addData(Seq(
        (10001L, known),                     // verbatim re-crawl of doc 3
        (10002L, "qq ww ee rr tt yy uu ii"))) // novel token soup
      q.processAllAvailable()
      val rows = spark.table("neardup").collect()
      val hits = rows.filter(_.getAs[Long]("doc_id") == 10001L)
      assert(hits.exists(r => r.getAs[Long]("dup_of") == 3L &&
        r.getAs[Double]("jaccard") == 1.0),
        s"re-crawl not flagged against doc 3: ${rows.mkString(";")}")
      assert(!rows.exists(_.getAs[Long]("doc_id") == 10002L),
        "novel doc falsely flagged")
    } finally q.stop()
  }

  test("streaming result equals the batch run of the same operator") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val index = StreamOps.signatureIndex(corpus).cache()
    // probe batch: shifted copies of three corpus docs → guaranteed hits
    val probes = corpus.filter(col("doc_id").isin(5L, 17L, 40L))
      .select((col("doc_id") + 90000L).as("doc_id"), col("text"))
    val batchRows = StreamOps.streamingNearDup(probes, index)
      .collect().map(_.toString).sorted
    assert(batchRows.nonEmpty, "batch probe produced no matches")
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingNearDup(
        input.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory")
      .queryName("neardup_eq").outputMode("append").start()
    try {
      input.addData(probes.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      val streamRows = spark.table("neardup_eq")
        .collect().map(_.toString).sorted
      assert(streamRows.sameElements(batchRows),
        s"stream/batch divergence:\nstream=${streamRows.mkString(";")}\nbatch=${batchRows.mkString(";")}")
    } finally q.stop()
  }
}
