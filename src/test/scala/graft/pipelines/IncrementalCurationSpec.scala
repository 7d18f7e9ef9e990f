package graft.pipelines

import graft.SparkSpecBase
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** The incremental pipeline's flagship contract: processing yesterday's
  * corpus then today's delta produces EXACTLY the decision table a full
  * rerun over the union produces — same components, same keep-best
  * winners, same splits — while touching only new docs and affected
  * components.
  */
class IncrementalCurationSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val cols = Seq("doc_id", "quality", "contam_ratio", "quality_pass",
    "contam_pass", "component", "dedup_keep", "keep", "split")

  test("incremental(A then B) row-equals full curate(A ∪ B)") {
    val all = spark.read.parquet(s"$sf/documents.parquet")
    val a = all.filter(col("doc_id") < 400)
    val b = all.filter(col("doc_id") >= 400)
    val bench = all.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val cfg = Curation.Config(minQuality = 2.95)

    val full = Curation.curate(all, bench, cfg)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted

    val prev = Curation.curate(a, bench, cfg)
      .select(cols.head, cols.tail: _*).cache()
    val prevIndex = StreamOps.signatureIndex(
      a.join(prev.filter(col("quality_pass") && col("contam_pass"))
        .select("doc_id"), Seq("doc_id")))
      .cache()
    val inc = Curation.curateIncremental(prev, prevIndex, b, bench, cfg)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted

    assert(inc.length == full.length,
      s"row counts differ: inc=${inc.length} full=${full.length}")
    inc.zip(full).zipWithIndex.find { case ((i, f), _) => i != f }.foreach {
      case ((i, f), idx) => fail(s"first divergence at $idx:\ninc =$i\nfull=$f")
    }
    assert(inc.sameElements(full))
  }

  test("the delta actually links across the A/B boundary (non-vacuous)") {
    // The synthetic edge structure must create at least one A–B near-dup
    // pair, otherwise the equivalence test only checks the trivial
    // untouched path. Assert a component contains ids from both sides.
    val all = spark.read.parquet(s"$sf/documents.parquet")
    val bench = all.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val full = Curation.curate(all, bench, Curation.Config(minQuality = 2.95))
    val mixed = full.groupBy(col("component"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") < 400 && col("hi") >= 400)
      .count()
    assert(mixed > 0, "no component spans the A/B split — pick a different split point")
  }
}
