package graft.queries

import graft.SparkSpecBase

/** Semantic edge cases of the curation battery (q69-q74) that the sf0.01
  * oracle pass can't isolate: deterministic reproducibility, split
  * completeness, decontamination self-exclusion, keep-decision
  * invariants, recall bounds.
  */
class CurationQSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def run(n: String) = Registry.byName(n).run(spark, sf)

  test("q71: every document lands in exactly one split, shares sum to 1 per lang") {
    val rows = run("q71_stratified_split").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val share = rs.map(_.getAs[Double]("lang_share")).sum
      assert(math.abs(share - 1.0) < 1e-12, s"$lang shares sum to $share")
    }
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(totalDocs == nDocs, s"split covers $totalDocs of $nDocs docs")
  }

  test("q71/q74: hash-derived assignments are identical across runs (seeded shuffle)") {
    Seq("q71_stratified_split", "q74_lang_sample").foreach { n =>
      val a = run(n).collect().map(_.toString)
      val b = run(n).collect().map(_.toString)
      assert(a.sameElements(b), s"$n is not reproducible")
    }
  }

  test("q70: benchmark documents never appear among the contaminated rows") {
    val ids = run("q70_decontam_overlap").collect().map(_.getAs[Long]("doc_id"))
    assert(ids.forall(_ % 97 != 0), "a benchmark doc leaked into the corpus side")
    val ratios = run("q70_decontam_overlap").collect().map(_.getAs[Double]("contam_ratio"))
    assert(ratios.forall(r => r > 0.0 && r <= 1.0), "contamination ratio out of (0, 1]")
  }

  test("q73: exactly one keeper per component, and it is the best-quality member") {
    val rows = run("q73_dedup_keep_best").collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("quality"), r.getAs[Boolean]("keep")))
    rows.groupBy(_._1).foreach { case (comp, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"component $comp has ${keepers.length} keepers")
      val best = members.minBy { case (_, id, q, _) => (-q, id) }
      assert(keepers.head._2 == best._2,
        s"component $comp kept ${keepers.head._2}, best is ${best._2}")
    }
  }

  test("q72: recall is within [0, 1] and n_exact is the full top-10") {
    run("q72_ann_recall").collect().foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getAs[Long]("n_exact") == 10L)
      assert(r.getAs[Long]("n_hit") <= 10L)
    }
  }

  test("q69: rank-1 terms maximize tf·N/df within their document") {
    val rows = run("q69_tfidf_terms").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk"), r.getAs[Double]("score")))
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b },
        s"doc $doc ranks are not score-descending")
    }
  }
}
