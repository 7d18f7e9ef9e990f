package graft.streaming

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The ingest-time span surgery's contract: bitwise stream ≡ batch
  * against the registered q117 on the same corpus/benchmark split, and
  * exact span algebra on hand-built documents. */
class StreamDecontamRewriteSpec extends SparkSpecBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def gramHashes(docs: DataFrame): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    docs.select(col("doc_id"), tk.as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(explode(transform(sequence(lit(1), size(col("tk")) - 2),
        g => TextFunctions.strHash(concat_ws(" ", element_at(col("tk"), g),
          element_at(col("tk"), g + 1), element_at(col("tk"), g + 2))))).as("h"))
      .distinct()
  }

  test("streaming rewrite is bitwise equal to the registered q117") {
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bench = gramHashes(docs.filter(col("doc_id") % 97 === 0)).cache()
    val cols = Seq("doc_id", "n_tok", "n_contam", "n_dropped", "cleaned")
    val batch = graft.queries.Registry.byName("q117_decontam_rewrite")
      .run(spark, sf)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingDecontamRewrite(
        input.toDF().toDF("doc_id", "text"), bench)
      .select(cols.head, cols.tail: _*)
      .writeStream.format("memory").queryName(s"dcrw_$runTag")
      .outputMode("append").start()
    try {
      val rows = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      input.addData(rows.take(rows.length / 2).toSeq)
      input.addData(rows.drop(rows.length / 2).toSeq)
      q.processAllAvailable()
      val streamRows = spark.table(q.name).collect().map(_.toString).sorted
      assert(streamRows.nonEmpty, "stream produced no rows")
      assert(streamRows.sameElements(batch),
        s"stream/batch divergence:\nstream=${streamRows.take(2).mkString(";")}\n" +
          s"batch=${batch.take(2).mkString(";")}")
    } finally q.stop()
  }

  test("span algebra: overlapping contaminated grams drop the union of their spans") {
    implicit val sqlCtx = spark.sqlContext
    // bench gram = "b c d": in "a b c d e", gram starts g=2 covers 2..4
    val bench = Seq(Tuple1("b c d")).toDF("g")
      .select(TextFunctions.strHash(col("g")).as("h"))
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingDecontamRewrite(
        input.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName(s"dcspan_$runTag")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, "a b c d e"), (2L, "x y"), (3L, "b c d")))
      q.processAllAvailable()
      val out = spark.table(q.name)
        .select("doc_id", "n_contam", "n_dropped", "cleaned")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)
      assert(out(0) === ((1L, 1L, 3L, "a e")))   // b c d dropped
      assert(out(1) === ((2L, 0L, 0L, "x y")))   // too short for grams
      assert(out(2) === ((3L, 1L, 3L, "")))      // fully contaminated
    } finally q.stop()
  }
}
