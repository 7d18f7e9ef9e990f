package graft.pipelines

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Curation.forget]]'s flagship contract — the inverse of the
  * incremental one: removing victims from a decision table and
  * re-deciding only their components' surviving members produces
  * EXACTLY the table a full rerun over corpus-minus-victims produces.
  * Survivor re-election and component splits are forced by hand-built
  * fixtures so the interesting paths provably execute.
  */
class ForgetSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val cols = Curation.DecisionCols

  private def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted

  test("forget(curate(A), V, A) row-equals full curate(A ∖ V)") {
    val all = spark.read.parquet(s"$sf/documents.parquet")
    val bench = all.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val cfg = Curation.Config(minQuality = 2.95)
    val victims = all.filter(col("doc_id") % 37 === 1).select("doc_id")
    val prev = Curation.curate(all, bench, cfg)
      .select(cols.head, cols.tail: _*).cache()
    val got = canon(Curation.forget(prev, victims, all, cfg))
    val want = canon(Curation.curate(
      all.join(victims, Seq("doc_id"), "left_anti"), bench, cfg))
    assert(got.length == want.length,
      s"row counts differ: forget=${got.length} rerun=${want.length}")
    got.zip(want).zipWithIndex.find { case ((g, w), _) => g != w }.foreach {
      case ((g, w), idx) => fail(s"first divergence at $idx:\nforget=$g\nrerun =$w")
    }
    prev.unpersist()
    ()
  }

  test("forgetting a kept member re-elects the survivor; a bridge victim splits the component") {
    import spark.implicits._
    // {1,2}: identical text — one component, tie on quality so the MIN
    // id (1) is kept. Forgetting 1 must re-elect 2.
    // {10,11,12}: 10 = X∪Y, 11 = X∪Y∪Z, 12 = Y∪Z — the chain edges sit
    // at j = 20/30 ≈ 0.67 (high enough for the bands to collide, the
    // IncrementalCurationSpec fixture's regime) while the ends share
    // only Y: j(10,12) = 10/30 ≈ 0.33 < 0.5 — no direct edge, 11 is
    // the bridge. Forgetting 11 must SPLIT the component: 10 and 12
    // each become their own, both kept.
    // prefixes chosen so BOTH chain edges band-collide under the shared
    // minhash constants (searched offline against MinhashA/B — the
    // IncrementalCurationSpec trick; deterministic forever)
    val x = (1 to 10).map(i => s"sig$i")
    val y = (1 to 10).map(i => s"phi$i")
    val z = (1 to 10).map(i => s"y$i")
    val mk = (id: Long, toks: Seq[String]) => (id, toks.mkString(" "))
    val docs = Seq(
      mk(1, (1 to 15).map(i => s"same$i")),
      mk(2, (1 to 15).map(i => s"same$i")),
      mk(10, x ++ y), mk(11, x ++ y ++ z), mk(12, y ++ z),
      mk(20, (1 to 12).map(i => s"lone$i"))).toDF("doc_id", "text")
    val bench = Seq(mk(999, (1 to 5).map(i => s"benchonly$i")))
      .toDF("doc_id", "text")
    val cfg = Curation.Config()
    val prev = Curation.curate(docs, bench, cfg)
      .select(cols.head, cols.tail: _*).cache()
    // fixture sanity: the LSH actually paired the chain
    val m0 = prev.collect().map(r => r.getLong(0) ->
      (r.getLong(5), r.getBoolean(6))).toMap // component, dedup_keep
    assert(m0(1)._1 == 1L && m0(2)._1 == 1L && m0(1)._2 && !m0(2)._2,
      s"fixture: {1,2} not one component with 1 kept: $m0")
    assert(m0(10)._1 == 10L && m0(11)._1 == 10L && m0(12)._1 == 10L,
      s"fixture: bridge chain not one component: $m0")
    val victims = Seq(1L, 11L).toDF("doc_id")
    val got = Curation.forget(prev, victims, docs, cfg)
    val want = Curation.curate(
      docs.join(victims, Seq("doc_id"), "left_anti"), bench, cfg)
    assert(canon(got).sameElements(canon(want)),
      s"forget diverged from the rerun:\n${canon(got).mkString("\n")}\n--\n${
        canon(want).mkString("\n")}")
    val m1 = got.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("component"), r.getAs[Boolean]("dedup_keep"))).toMap
    assert(m1(2) == (2L, true), s"survivor not re-elected: $m1")
    assert(m1(10) == (10L, true) && m1(12) == (12L, true),
      s"bridge removal did not split the component: $m1")
    prev.unpersist()
    ()
  }
}
