package graft.operators

import graft.SparkSpecBase
import graft.functions.IntOps
import org.apache.spark.sql.functions._

/** Fixed-point BM25 against an independent in-test integer model: the
  * operator's Column pipeline and a plain-Scala reimplementation of the
  * same pinned formula must agree exactly — a divergence means the
  * Spark arithmetic (join shape, coalesce, div) drifted from the
  * documented math the DuckDB oracle also implements. */
class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  // corpus: d1 "x x y", d2 "x z", d3 "y y y z"
  //   N = 3 docs, T = 9 tokens, avgdl_s = 9·10000 div 3 = 30000
  //   df: x→2, y→2, z→2
  private def corpusTf = UnigramLm.termFreq(
    Seq((1L, "x x y"), (2L, "x z"), (3L, "y y y z")).toDF("doc_id", "text"),
    "doc_id", "text")

  /** The documented fixed-point formula, independently in plain Scala. */
  private def model(tf: Long, dl: Long, df: Long, nDocs: Long, avgdlS: Long): Long = {
    val s = Bm25.Scale
    val sat = (8 * tf * avgdlS * s) / (4 * tf * avgdlS + avgdlS + 3 * dl * s)
    (2 * nDocs - 2 * df + 1) * sat / (2 * df + 1)
  }

  test("scorePairs matches the independent integer model exactly") {
    val qt = Seq((0L, "x", 2L), (0L, "z", 2L)).toDF("q_id", "term", "df")
    val out = Bm25.scorePairs(corpusTf, qt)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"), r.getAs[Long]("bm25_s")))
    val expected = Array(
      (1L, 1L, model(2, 3, 2, 3, 30000)),
      (2L, 2L, model(1, 2, 2, 3, 30000) + model(1, 2, 2, 3, 30000)),
      (3L, 1L, model(1, 4, 2, 3, 30000)))
    assert(out === expected)
    // and the hand-derived absolute values, so the model itself is pinned
    assert(expected.map(_._3) === Array(7999L, 13712L, 5332L))
  }

  test("queryTerms picks rarest-first with term tie-break and honors the df prune") {
    val dfreq = Seq(("a", 5L), ("b", 2L), ("c", 2L), ("d", 1L)).toDF("term", "df")
    val n = Seq(Tuple1(10L)).toDF("n_docs")
    val qdocs = Seq((7L, "a"), (7L, "b"), (7L, "c"), (7L, "d")).toDF("q_id", "term")
    // default 100‰ cap: df ≤ 1 → only d survives
    val strict = Bm25.queryTerms(qdocs, dfreq, n).select("term").as[String].collect()
    assert(strict === Array("d"))
    // wide open: rarest-first d(1), then b/c (df 2, term asc), then a
    val all = Bm25.queryTerms(qdocs, dfreq, n, maxDfPermille = 1000L)
      .orderBy("df", "term").select("term").as[String].collect()
    assert(all === Array("d", "b", "c", "a"))
  }

  test("scorePairs broadcasts the query side and plans no cartesian product") {
    val qt = Seq((0L, "x", 2L)).toDF("q_id", "term", "df")
    val plan = Bm25.scorePairs(corpusTf, qt).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("idiv is exact 64-bit integer division (no double rounding)") {
    // 2⁶² + 1 over 2: a double round-trip would lose the low bit
    val big = (1L << 62) + 1L
    val out = Seq((big, 2L)).toDF("a", "b")
      .select(IntOps.idiv(col("a"), col("b")).as("q")).as[Long].head()
    assert(out === big / 2)
  }
}
