package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The lexical index's STREAM DELTA side: per-trigger `b=` appends are
  * O(batch) (the old per-trigger merge rewrote every touched bucket —
  * the whole postings index at any real batch size), and a pinned
  * search over bulk + delta must be VALUE-EQUAL to searching the merged
  * index — df composed per term, stats composed through the build's
  * exact integer arithmetic, candidate rows unioned. Re-delivered
  * batches (the fresh-checkpoint lineage shape) converge by the
  * lowest-batch read dedup; the day-end fold (merge + clear) lands the
  * same rows the delta served. */
class LexIndexDeltaSpec extends SparkSpecBase {

  private def docsAt(d: String): DataFrame =
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def searchRows(p: String, qterms: DataFrame): Array[String] =
    LexIndex.pinned(spark, p).search(qterms, 5)
      .select(col("q_id"), col("rk"), col("doc_id"), col("n_hit"),
        round(col("bm25_s"), 9).as("s"))
      .collect().map(_.toString).sorted

  private def statsRowOf(p: String): String =
    LexIndex.pinned(spark, p).stats.collect().map(_.toString).mkString

  test("delta-composed search/df/stats equal the merged index; fold converges; delete refuses a live delta") {
    val docs = docsAt("/root/testdata/sf0.001")
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b1 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
    val live = tempDir("lexdelta_live")
    val full = tempDir("lexdelta_full")
    LexIndex.build(UnigramLm.termFreq(a, "doc_id", "text"), live)
    LexIndex.build(
      UnigramLm.termFreq(docs, "doc_id", "text"), full)

    // two micro-batches land on the delta side — O(batch) writes only,
    // fenced on the lineage generation pinned at stream start
    val gen = LexIndex.deltaGen(spark, live)
    assert(LexIndex.deltaBatchBase(spark, live) == 0L)
    LexIndex.appendStreamDeltaBatch(spark, live, b1, 0L, gen)
    LexIndex.appendStreamDeltaBatch(spark, live, b2, 1L, gen)
    assert(LexIndex.deltaBatchBase(spark, live) == 2L,
      "delta batch keys must offset past the present lineage")

    // query terms drawn from both the old corpus and the delta docs
    val qdocs = docs.filter(col("doc_id") % 40 === 0)
    val qterms = qdocs.select(col("doc_id").as("q_id"),
      explode(array_distinct(
        graft.functions.TextFunctions.tokens(col("text")))).as("term"))
      .filter(length(col("term")) >= 4)
      .localCheckpoint(true)

    assert(statsRowOf(live) == statsRowOf(full),
      "composed stats diverge from the merged index's")
    val dfLive = LexIndex.pinned(spark, live).termDf(qterms.select("term"))
      .collect().map(_.toString).sorted
    val dfFull = LexIndex.pinned(spark, full).termDf(qterms.select("term"))
      .collect().map(_.toString).sorted
    assert(dfLive.sameElements(dfFull),
      "composed df diverges from the merged index's")
    val got = searchRows(live, qterms)
    val want = searchRows(full, qterms)
    assert(got.nonEmpty && got.sameElements(want),
      "delta-composed search diverges from the merged index")

    // a RE-DELIVERED batch in a new checkpoint lineage (numbering past
    // the present max — the staging convention; same generation: no
    // reconcile intervened) is converged by the read dedup, not
    // double-counted
    LexIndex.appendStreamDeltaBatch(spark, live, b1,
      LexIndex.deltaBatchBase(spark, live), gen)
    assert(searchRows(live, qterms).sameElements(want),
      "re-delivered delta batch double-counted in search")
    assert(statsRowOf(live) == statsRowOf(full),
      "re-delivered delta batch double-counted in stats")

    // mutations that cannot see the delta refuse it loudly
    import spark.implicits._
    val err = intercept[IllegalArgumentException](
      LexIndex.delete(spark, live, Seq(0L).toDF("doc_id")))
    assert(err.getMessage.contains("delta"), err.getMessage)

    // the day-end fold: RETIRE the delta (generation bump), land the
    // day through ONE ordinary merge — the postings now equal the
    // merged build and the search stays value-equal
    LexIndex.clearStreamDelta(spark, live)
    // ZOMBIE FENCE: a late micro-batch from the retired lineage must
    // fail loudly, not land rows the composed search would
    // double-count against the folded bulk
    val zombie = intercept[IllegalStateException](
      LexIndex.appendStreamDeltaBatch(spark, live, b1, 99L, gen))
    assert(zombie.getMessage.contains("retired"), zombie.getMessage)
    LexIndex.merge(spark, live,
      UnigramLm.termFreq(b1.unionByName(b2), "doc_id", "text"))
    def postings(p: String) = LexIndex.openPostings(spark, p)
      .collect().map(_.toString).sorted
    assert(postings(live).sameElements(postings(full)),
      "post-fold postings diverge from the merged build")
    assert(searchRows(live, qterms).sameElements(want),
      "post-fold search diverged")

    // the retired generation's physical files (kept through the fold
    // for reader grace) are swept by the next zero-grace gc — a store
    // whose streaming stopped does not carry a day's delta forever
    LexIndex.gc(spark, live, 0L)
    val gDirs = Option(new java.io.File(s"$live/delta").listFiles)
      .map(_.map(_.getName).filter(_.startsWith("g=")).toSeq)
      .getOrElse(Seq.empty)
    assert(gDirs.isEmpty, s"retired delta generations survived gc: $gDirs")
  }
}
