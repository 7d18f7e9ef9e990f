package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: pair statistics, single-merge application
  * semantics (left-to-right, no same-pass re-merge), the deterministic
  * trainer on the classic low/lower/newest/widest corpus, and the encode
  * replay. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("initVocab counts words across documents and splits to characters") {
    val v = Bpe.initVocab(docsOf("ab ab cd", "ab"), "text")
      .orderBy("w").collect()
    assert(v.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("ab", 3L), ("cd", 1L)))
    assert(v.head.getSeq[String](2) === Seq("a", "b"))
  }

  test("pairCounts weights adjacent pairs by word frequency") {
    // "abc"×2, "bc"×1 → (a,b)=2, (b,c)=3
    val vocab = Seq(("abc", 2L), ("bc", 1L))
      .toDF("w", "freq")
      .withColumn("syms", split(col("w"), ""))
      .withColumn("syms", filter(col("syms"), s => length(s) > 0))
    val pc = Bpe.pairCounts(vocab).orderBy("lft", "rgt").collect()
    assert(pc.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("a", "b", 2L), ("b", "c", 3L)))
  }

  test("applyMerge is left-to-right without same-pass re-merge") {
    val df = Seq(
      Seq("a", "a", "a", "a"), // → aa aa
      Seq("a", "a", "a"),      // → aa a  (no re-merge of the fresh token)
      Seq("b", "a", "a", "b"), // → b aa b
      Seq("a", "b"),           // untouched
      Seq.empty[String]
    ).toDF("syms").select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
    val out = df.collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("aa", "aa"))
    assert(out(1) === Seq("aa", "a"))
    assert(out(2) === Seq("b", "aa", "b"))
    assert(out(3) === Seq("a", "b"))
    assert(out(4) === Seq.empty[String])
  }

  test("train learns the classic corpus's merges deterministically") {
    // word freqs: low×5, lower×2, newest×6, widest×3 (the textbook
    // example). Round 1: (e,s) = 6+3 = 9 and (s,t) = 9 tie on count —
    // the (lft, rgt) ASC tie-break picks (e,s). Round 2: (es,t) = 9.
    val docs = docsOf(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val (merges, vocab) = Bpe.train(docs, "text", rounds = 3)
    assert(merges.map(m => (m.lft, m.rgt, m.cnt)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
    assert(merges.map(_.round) === Seq(1, 2, 3))
    val newest = vocab.filter(col("w") === "newest")
      .select("syms").head().getSeq[String](0)
    assert(newest === Seq("n", "e", "w", "est"))
  }

  test("train stops early when no pair reaches minCount") {
    val (merges, _) = Bpe.train(docsOf("ab cd"), "text",
      rounds = 5, minCount = 2L)
    assert(merges.isEmpty)
  }

  test("encode replays the learned merges over unseen text") {
    val docs = docsOf(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val (merges, _) = Bpe.train(docs, "text", rounds = 2)
    val enc = Bpe.encode(docsOf("best"), "text", merges)
      .select("syms").head().getSeq[String](0)
    // (e,s) then (es,t): b est
    assert(enc === Seq("b", "est"))
  }

  test("the merge-round plan has no cartesian product and one corpus pass") {
    val vocab = Bpe.initVocab(docsOf("aa bb aa"), "text")
    val p = Bpe.pairCounts(vocab).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }
}
