package graft.pipelines

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  // Hand-sized corpus covering every decision path: a benchmark-verbatim
  // doc, a near-dup pair differing in quality, a low-quality doc, and
  // clean keepers.
  private val corpus = Seq(
    (1L, "spark shuffles the partition data across the executor fleet nodes"),
    // near-dup of 1 (appended token: both LSH bands collide, jaccard 0.9)
    (2L, "spark shuffles the partition data across the executor fleet nodes quickly"),
    (3L, "benchmark eval question about joins and aggregation semantics here"), // contaminated
    (4L, "!!! ... ;;; the the the the the the the the the the the the"), // low quality
    (5L, "catalyst rewrites logical plans before tungsten executes them")
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (100L, "benchmark eval question about joins and aggregation semantics here"))
    .toDF("doc_id", "text")

  private def result = Curation.curate(corpus, bench,
    Curation.Config(minQuality = 1.0, maxContamRatio = 0.3, jaccardThreshold = 0.5))

  test("every corpus doc gets exactly one decision row with all verdicts") {
    val rows = result.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
  }

  test("the contaminated doc fails contamination, not quality") {
    val r3 = result.filter($"doc_id" === 3L).collect().head
    assert(!r3.getAs[Boolean]("contam_pass"))
    assert(r3.getAs[Boolean]("quality_pass"))
    assert(!r3.getAs[Boolean]("keep"))
    assert(r3.getAs[String]("split") == null)
  }

  test("the low-quality doc fails quality") {
    val r4 = result.filter($"doc_id" === 4L).collect().head
    assert(!r4.getAs[Boolean]("quality_pass"))
    assert(!r4.getAs[Boolean]("keep"))
  }

  test("near-dups collapse to one keeper, the higher-quality member") {
    val nd = result.filter($"doc_id".isin(1L, 2L)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"),
        r.getAs[Boolean]("dedup_keep"))).sortBy(_._1)
    assert(nd.map(_._3).count(identity) == 1, s"expected one keeper in $nd")
    val keeper = nd.find(_._3).get
    val other = nd.find(!_._3).get
    assert(keeper._2 >= other._2, "kept the lower-quality near-dup")
    // both belong to one component
    val comps = result.filter($"doc_id".isin(1L, 2L))
      .select($"component").as[Long].collect().distinct
    assert(comps.length == 1)
  }

  test("clean docs keep themselves and get a split") {
    val r5 = result.filter($"doc_id" === 5L).collect().head
    assert(r5.getAs[Boolean]("keep"))
    assert(Set("train", "val", "test").contains(r5.getAs[String]("split")))
  }

  test("dropped docs never influence dedup: removing doc 3 leaves components unchanged") {
    val without3 = Curation.curate(corpus.filter($"doc_id" =!= 3L), bench,
      Curation.Config(minQuality = 1.0, maxContamRatio = 0.3, jaccardThreshold = 0.5))
    val a = result.filter($"keep").select($"doc_id").as[Long].collect().sorted
    val b = without3.filter($"keep").select($"doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("pipeline is deterministic across runs") {
    val a = result.orderBy($"doc_id").collect().map(_.toString)
    val b = result.orderBy($"doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
