package graft.streaming

import graft.SparkSpecBase
import graft.operators.UnigramLm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming LM gate's contract: bitwise stream ≡ batch against
  * `UnigramLm.score` (integer sums commute; one shared division), OOV
  * semantics, and statelessness (no aggregation state, append mode).
  */
class StreamLmScoreSpec extends SparkSpecBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def trainedLm() = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    UnigramLm.train(
      UnigramLm.termFreq(docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text")).cache()
  }

  test("streaming scores are bitwise equal to the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lm = trainedLm()
    val probe = docs.filter(col("doc_id") % 7 =!= 0).limit(40)
      .select(col("doc_id"), col("text"))
    val batch = UnigramLm.score(
        UnigramLm.termFreq(probe, "doc_id", "text"), lm, "doc_id")
      .select("doc_id", "n_tokens", "n_oov", "mean_p", "oov_frac", "keep")
      .collect().map(_.toString).sorted
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingLmScore(
        input.toDF().toDF("doc_id", "text"), lm)
      .select("doc_id", "n_tokens", "n_oov", "mean_p", "oov_frac", "keep")
      .writeStream.format("memory").queryName(s"lmscore_$runTag")
      .outputMode("append").start()
    try {
      input.addData(probe.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      val streamRows = spark.table(q.name).collect().map(_.toString).sorted
      assert(streamRows.nonEmpty, "stream produced no rows")
      assert(streamRows.sameElements(batch),
        s"stream/batch divergence:\nstream=${streamRows.take(3).mkString(";")}\n" +
          s"batch=${batch.take(3).mkString(";")}")
    } finally q.stop()
  }

  test("OOV-heavy and tokenless documents behave like batch") {
    implicit val sqlCtx = spark.sqlContext
    val lm = trainedLm()
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingLmScore(
        input.toDF().toDF("doc_id", "text"), lm)
      .writeStream.format("memory").queryName(s"lmoov_$runTag")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (1L, "zzqq zzww zzee"), // all-OOV → keep = false
        (2L, "  "),             // tokenless → dropped, like batch
        (3L, "zzqq")))          // single OOV token
      q.processAllAvailable()
      val rows = spark.table(q.name).collect()
      assert(!rows.exists(_.getAs[Long]("doc_id") == 2L),
        "tokenless doc must be dropped (batch has no tf rows for it)")
      val d1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
      assert(d1.getAs[Long]("n_oov") === 3L && !d1.getAs[Boolean]("keep"))
      val d3 = rows.find(_.getAs[Long]("doc_id") == 3L).get
      // all-OOV single token: l_num = 1 → mean_p = 1/(1·(C+V))
      assert(d3.getAs[Long]("n_oov") === 1L)
      assert(d3.getAs[Double]("mean_p") > 0.0)
    } finally q.stop()
  }

  test("the streaming plan is stateless (no StateStore operator)") {
    implicit val sqlCtx = spark.sqlContext
    val lm = trainedLm()
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingLmScore(
        input.toDF().toDF("doc_id", "text"), lm)
      .writeStream.format("memory").queryName(s"lmstate_$runTag")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, "a b c")))
      q.processAllAvailable()
      val p = q.lastProgress
      assert(p == null || p.stateOperators.isEmpty,
        s"LM scoring must hold no streaming state: ${p.stateOperators.mkString(",")}")
    } finally q.stop()
  }
}
