package graft.pipelines

import graft.SparkSpecBase
import graft.operators.ChunkDedup
import org.apache.spark.sql.functions._

/** The chunk-grain daily loop's golden contract: chunkInit on day-0
  * corpus, then chunkStep per daily delta, must reproduce — row for
  * row — the single full ChunkDedup.rewrite over the union, and the
  * persisted index must stay duplicate-free across steps (a duplicated
  * hash row would fan out every later probe join).
  */
class DailyChunkSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("init + two steps == one full rewrite over the union; index stays duplicate-free") {
    val dir = java.nio.file.Files.createTempDirectory("daily_chunk").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    // ascending-id split: day 0 = bottom half, then two deltas; the
    // corpus's repeated chunks span the splits (boilerplate families
    // exist at sf0.001), so the equivalence is non-vacuous
    val day0 = docs.filter(col("doc_id") % 4 =!= 3 && col("doc_id") % 4 =!= 2)
    val day1 = docs.filter(col("doc_id") % 4 === 2)
      .withColumn("doc_id", col("doc_id") + 100000L)
    val day2 = docs.filter(col("doc_id") % 4 === 3)
      .withColumn("doc_id", col("doc_id") + 200000L)

    DailyDriver.chunkInit(spark, day0, dir)
    val out1 = DailyDriver.chunkStep(spark, day1, dir)
    assert(out1.count() == day1.count(), "step 1 lost rows")
    DailyDriver.chunkStep(spark, day2, dir)

    def cleaned(): Array[String] =
      DailyDriver.openCleaned(spark, dir).collect().map(_.toString).sorted
    val incremental = cleaned()
    val full = ChunkDedup.rewrite(
        day0.unionByName(day1).unionByName(day2), "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(incremental.length == full.length,
      s"row count: incremental ${incremental.length} vs full ${full.length}")
    assert(incremental.sameElements(full),
      "incremental chunk loop diverged from the full rewrite")
    // non-vacuous: some chunk was actually cut ACROSS a split boundary
    val crossCut = DailyDriver.openCleaned(spark, dir)
      .filter(col("doc_id") >= 100000L && col("n_kept") < col("n_chunks"))
      .count()
    assert(crossCut > 0, "no cross-day chunk was cut — contract is vacuous")
    def idxRows(): Array[String] =
      DailyDriver.openChunkIndex(spark, dir).collect().map(_.toString).sorted
    val idx = idxRows()
    assert(idx.length == idx.distinct.length, "chunk index holds duplicates")

    // RETRY idempotence: re-running a step (the recovery for a crash at
    // any point inside it) must leave both tables byte-identical — the
    // re-run overwrites its own batch partition and probes only PRIOR
    // batches, so its first attempt's hashes don't mask its own chunks
    DailyDriver.chunkStep(spark, day2, dir)
    assert(cleaned().sameElements(incremental),
      "retried step changed the cleaned corpus")
    assert(idxRows().sameElements(idx), "retried step changed the chunk index")
  }
}
