package graft.streaming

import graft.SparkSpecBase
import graft.operators.SemanticDecontam
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** SemanticDecontam.flag is stream-safe as written: the bench side is a
  * static one-row broadcast and the corpus side is map-only, so the
  * SAME operator body runs on a streaming frame with zero state — flag
  * arriving embeddings against the benchmark at ingest, before they
  * ever land in the corpus. */
class StreamDecontamSpec extends SparkSpecBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("streaming flags are identical to the batch operator, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bench = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val probe = emb.filter(col("vec_id") % 97 =!= 0).limit(120)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val batch = SemanticDecontam.flag(probe, bench, "id", "vec", 0.30)
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty, "batch probe produced no flags")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = SemanticDecontam.flag(
        input.toDF().toDF("id", "vec"), bench, "id", "vec", 0.30)
      .writeStream.format("memory").queryName(s"sdecontam_$runTag")
      .outputMode("append").start()
    try {
      input.addData(probe.as[(Long, Seq[Float])].collect().toSeq)
      q.processAllAvailable()
      val streamRows = spark.table(q.name).collect().map(_.toString).sorted
      assert(streamRows.sameElements(batch),
        s"stream/batch divergence: ${streamRows.length} vs ${batch.length} rows")
      val p = q.lastProgress
      assert(p == null || p.stateOperators.isEmpty,
        "decontam flagging must hold no streaming state")
    } finally q.stop()
  }
}
