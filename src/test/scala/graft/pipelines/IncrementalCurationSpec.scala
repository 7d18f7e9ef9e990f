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
  private val cols = Curation.DecisionCols

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
  }

  test("a new doc merging TWO old components matches the full rerun (t = 0.4)") {
    import spark.implicits._
    // Hand-built corpus: A-components {1,2} (tokens x) and {3,4}
    // (x1..x10 ∪ y) overlap at jaccard 10/30 = 0.33 — BELOW threshold,
    // so they stay separate in the prior run. The B doc holds x ∪ y:
    // jaccard 20/30 ≈ 0.67 to each side, high enough for the 2×4
    // MinHash bands to collide, so it merges both old components.
    // Threshold 0.4 (non-default) proves the parameter reaches every
    // pair path consistently.
    // token names chosen so the band argmins of B fall in both halves
    // (checked against the shared hash constants — deterministic forever)
    val x = (1 to 20).map(i => s"x$i")
    val y = (1 to 10).map(i => s"y$i")
    val a3Tokens = x.take(10) ++ y
    val bTokens = x ++ y
    val mk = (id: Long, toks: Seq[String]) => (id, toks.mkString(" "))
    val a = Seq(mk(1, x), mk(2, x), mk(3, a3Tokens), mk(4, a3Tokens),
      mk(5, (1 to 20).map(i => s"gamma$i"))).toDF("doc_id", "text")
    val b = Seq(mk(101, bTokens)).toDF("doc_id", "text")
    val bench = Seq((900L, "nothing shared here at all")).toDF("doc_id", "text")
    val cfg = Curation.Config(minQuality = -1e9, jaccardThreshold = 0.4)

    val full = Curation.curate(a.unionByName(b), bench, cfg)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    val prev = Curation.curate(a, bench, cfg)
      .select(cols.head, cols.tail: _*).cache()
    val prevIndex = StreamOps.signatureIndex(
      a.join(prev.filter(col("quality_pass") && col("contam_pass"))
        .select("doc_id"), Seq("doc_id"))).cache()
    val inc = Curation.curateIncremental(prev, prevIndex, b, bench, cfg)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    assert(inc.sameElements(full),
      s"merge divergence:\ninc =${inc.mkString(";")}\nfull=${full.mkString(";")}")
    // the prior run really had TWO components, and the merge really
    // happened: docs 1-4 and 101 share one component after the delta
    val prevComps = prev.filter(col("doc_id").isin(1L, 2L, 3L, 4L))
      .select(col("component")).distinct().count()
    assert(prevComps == 2L, s"fixture broke: prior run has $prevComps comps, want 2")
    val comps = Curation.curate(a.unionByName(b), bench, cfg)
      .filter(col("doc_id").isin(1L, 2L, 3L, 4L, 101L))
      .select(col("component")).distinct().count()
    assert(comps == 1L, s"expected one merged component, got $comps")
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
