package graft.pipelines

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MULTI-step equivalence for the packaged daily driver: two
  * consecutive `step`s over a persisted layout must land on exactly
  * the decision table a full `curate` over the three-day corpus
  * produces. One step is IncrementalCurationSpec's claim; two steps
  * additionally prove the INDEX MAINTENANCE — day 2's arrivals must
  * pair against day 1's candidates through the appended signatures,
  * or components forming across the day-1/day-2 boundary are lost. */
class DailyDriverApiSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val cfg = Curation.Config(minQuality = 2.95)

  test("init + step + step equals the full rerun over the three-day corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = docs.filter(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2)
    val b1 = docs.filter(col("doc_id") % 4 === 3)
    val b2 = docs.filter(col("doc_id") % 4 === 0)
    val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val dir = tempDir("daily-driver-api")

    DailyDriver.init(spark, a, bench, dir, cfg)
    DailyDriver.step(spark, b1, bench, dir, cfg)
    val got = DailyDriver.step(spark, b2, bench, dir, cfg)

    val want = Curation.curate(docs, bench, cfg)
      .select(Curation.DecisionCols.map(col): _*)
    def canon(df: DataFrame): Array[String] =
      df.select(Curation.DecisionCols.map(col): _*)
        .collect().map(_.toString).sorted
    val g = canon(got)
    val w = canon(want)
    assert(g.length == w.length, s"row count ${g.length} vs ${w.length}")
    assert(g.sameElements(w), "two-step daily driver diverged from full rerun")

    // non-vacuity: a component must span the day-1/day-2 boundary —
    // the case that only works if step 2 probed step 1's appended
    // signatures
    val comp = got.filter(col("quality_pass") && col("contam_pass"))
      .select(col("doc_id"), col("component"))
    val c1 = comp.join(b1.select("doc_id"), Seq("doc_id"))
      .select(col("component")).distinct()
    val c2 = comp.join(b2.select("doc_id"), Seq("doc_id"))
      .select(col("component")).distinct()
    assert(c1.join(c2, Seq("component")).count() > 0,
      "no component spans the day-1/day-2 boundary — index-append path untested")

    // the retrieval index maintained across the two steps must equal a
    // full LexIndex.build over the three-day corpus's candidates
    import graft.operators.{LexIndex, UnigramLm}
    val allCand = docs.join(
      got.filter(col("quality_pass") && col("contam_pass")).select("doc_id"),
      Seq("doc_id"))
    val fullLex = tempDir("daily-driver-lex-full")
    LexIndex.build(UnigramLm.termFreq(allCand, "doc_id", "text"), fullLex)
    def postings(p: String): Array[String] =
      LexIndex.openPostings(spark, p)
        .select("term", "doc_id", "tf", "dl", "df", "tb")
        .collect().map(_.toString).sorted
    val (inc, full) = (postings(s"$dir/lex_index"), postings(fullLex))
    assert(inc.length == full.length,
      s"lex posting counts differ: ${inc.length} vs ${full.length}")
    assert(inc.sameElements(full),
      "stepwise lexical index diverged from the full rebuild")

    // offline maintenance must be a pure re-layout: decision table,
    // signature index, and lexical index all row-identical after it
    def sigRows(): Array[String] =
      spark.read.parquet(s"$dir/sig_index").collect().map(_.toString).sorted
    val sigBefore = sigRows()
    DailyDriver.maintain(spark, dir)
    assert(sigRows().sameElements(sigBefore),
      "maintain changed the signature index rows")
    assert(postings(s"$dir/lex_index").sameElements(full),
      "maintain changed the lexical index rows")
    assert(canon(spark.read.parquet(s"$dir/decisions")).sameElements(w),
      "maintain changed the decision table")
  }
}
