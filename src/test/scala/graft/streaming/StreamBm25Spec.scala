package graft.streaming

import graft.SparkSpecBase
import graft.operators.{Bm25, UnigramLm}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming BM25 gate's contract: bitwise stream ≡ batch against
  * `Bm25.scorePairs` under the SAME pinned corpus statistics (integer
  * fixed-point scores commute into identical sums), and statelessness
  * (append mode, no aggregation state). */
class StreamBm25Spec extends SparkSpecBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("streaming scores are bitwise equal to the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val probe = docs.filter(col("doc_id") % 97 =!= 0).limit(40)
      .select(col("doc_id"), col("text"))
    val tf = UnigramLm.termFreq(probe, "doc_id", "text").cache()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
    val qdocs = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).as("term"))
    val qterms = Bm25.queryTerms(qdocs, dfreq, nDocs, maxDfPermille = 1000L).cache()
    val stats = Bm25.stats(tf).cache()
    val cols = Seq("q_id", "doc_id", "n_hit", "bm25_s")
    val batch = Bm25.scorePairs(tf, qterms, stats)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted

    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingBm25(
        input.toDF().toDF("doc_id", "text"), qterms, stats)
      .select(cols.head, cols.tail: _*)
      .writeStream.format("memory").queryName(s"bm25_$runTag")
      .outputMode("append").start()
    try {
      // two micro-batches: per-doc scoring must not depend on batching
      val rows = probe.as[(Long, String)].collect()
      input.addData(rows.take(15).toSeq)
      input.addData(rows.drop(15).toSeq)
      q.processAllAvailable()
      val streamRows = spark.table(q.name).collect().map(_.toString).sorted
      assert(streamRows.nonEmpty, "stream produced no rows")
      assert(streamRows.sameElements(batch),
        s"stream/batch divergence:\nstream=${streamRows.take(3).mkString(";")}\n" +
          s"batch=${batch.take(3).mkString(";")}")
    } finally q.stop()
  }

  test("documents with no matched query term emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val qterms = Seq((0L, "needleword", 1L)).toDF("q_id", "term", "df")
    val stats = Seq((10L, 100L, 10L * Bm25.Scale)).toDF("n_docs", "t_total", "avgdl_s")
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingBm25(
        input.toDF().toDF("doc_id", "text"), qterms, stats)
      .writeStream.format("memory").queryName(s"bm25miss_$runTag")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, "no hit here"), (2L, ""), (3L, "needleword twice needleword")))
      q.processAllAvailable()
      val out = spark.table(q.name).select("doc_id").as[Long].collect()
      assert(out.toSeq === Seq(3L))
    } finally q.stop()
  }
}
