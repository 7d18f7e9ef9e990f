package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Reference-LM scoring against hand-computed rationals: the smoothed
  * probabilities, OOV accounting, and the exact-integer keep verdict. */
class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  // reference corpus: "a a b" + "a c" → c_a=3, c_b=1, c_c=1;
  // C = 5 tokens, V = 3 terms → denominator C + V = 8
  private def refTf = UnigramLm.termFreq(
    Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text"), "doc_id", "text")

  test("termFreq is (doc, term) grain with counts") {
    val tf = refTf.orderBy("doc_id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(tf === Array((1L, "a", 2L), (1L, "b", 1L), (2L, "a", 1L), (2L, "c", 1L)))
  }

  test("score computes exact smoothed mean probability and OOV stats") {
    val lm = UnigramLm.train(refTf)
    // doc 10: "a a z" → n=3, l_num = 2·(3+1) + 1·(0+1) = 9, n_oov = 1
    //   mean_p = 9 / (3·8) = 0.375 exactly; keep: 1·2 ≤ 3
    // doc 11: "z z q" → n=3, l_num = 3·1 = 3, n_oov = 3
    //   mean_p = 3/24 = 0.125; keep: 3·2 ≤ 3 is false
    val tf = UnigramLm.termFreq(
      Seq((10L, "a a z"), (11L, "z z q")).toDF("doc_id", "text"),
      "doc_id", "text")
    val out = UnigramLm.score(tf, lm, "doc_id").orderBy("doc_id").collect()
    val d10 = out(0)
    assert(d10.getLong(0) === 10L)
    assert(d10.getAs[Long]("n_tokens") === 3L)
    assert(d10.getAs[Long]("n_oov") === 1L)
    assert(d10.getAs[Double]("mean_p") === 0.375) // exact: 9/24
    assert(d10.getAs[Boolean]("keep"))
    val d11 = out(1)
    assert(d11.getAs[Long]("n_oov") === 3L)
    assert(d11.getAs[Double]("mean_p") === 0.125) // exact: 3/24
    assert(!d11.getAs[Boolean]("keep"))
  }

  test("keep boundary is an exact integer comparison (OOV exactly half)") {
    val lm = UnigramLm.train(refTf)
    // "a z": n=2, n_oov=1 → 1·2 ≤ 2 → keep (half OOV is still kept)
    val tf = UnigramLm.termFreq(Seq((20L, "a z")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(UnigramLm.score(tf, lm, "doc_id").head().getAs[Boolean]("keep"))
  }

  test("merge(train(A), train(B)) equals train(A ∪ B) exactly") {
    val a = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val b = Seq((3L, "b b d"), (4L, "a")).toDF("doc_id", "text")
    val merged = UnigramLm.merge(
        UnigramLm.train(UnigramLm.termFreq(a, "doc_id", "text")),
        UnigramLm.train(UnigramLm.termFreq(b, "doc_id", "text")))
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1)))
    val full = UnigramLm.train(
        UnigramLm.termFreq(a.unionByName(b), "doc_id", "text"))
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(merged.sameElements(full),
      s"merged=${merged.mkString(",")} full=${full.mkString(",")}")
    // and the SCORES agree too — same model ⇒ bitwise-equal verdicts
    val probe = UnigramLm.termFreq(
      Seq((10L, "a b zz")).toDF("doc_id", "text"), "doc_id", "text")
    val sMerged = UnigramLm.score(probe,
      UnigramLm.merge(
        UnigramLm.train(UnigramLm.termFreq(a, "doc_id", "text")),
        UnigramLm.train(UnigramLm.termFreq(b, "doc_id", "text"))),
      "doc_id").collect().map(_.toString)
    val sFull = UnigramLm.score(probe,
      UnigramLm.train(UnigramLm.termFreq(a.unionByName(b), "doc_id", "text")),
      "doc_id").collect().map(_.toString)
    assert(sMerged.sameElements(sFull))
  }

  test("the LM joins broadcast; no corpus shuffle on the term key") {
    val lm = UnigramLm.train(refTf)
    val tf = UnigramLm.termFreq(Seq((30L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text")
    val p = UnigramLm.score(tf, lm, "doc_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"LM dimension shuffled the corpus:\n$p")
  }
}
