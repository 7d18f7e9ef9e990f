package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Embedding-space decontamination: hand-computed cosines, lowest-id
  * tie-break, threshold boundary inclusion, and the zero-norm guard on
  * both sides. */
class SemanticDecontamSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "vec")

  test("flags rows at or above the threshold with exact cosines") {
    val bench = df(100L -> Seq(1f, 0f), 101L -> Seq(0f, 1f))
    val corpus = df(
      1L -> Seq(2f, 0f),   // cos=1 with bench 100
      2L -> Seq(1f, 1f),   // cos=1/√2 ≈ 0.7071 with both
      3L -> Seq(-1f, 0f))  // cos ≤ 0 with both
    val out = SemanticDecontam.flag(corpus, bench, "id", "vec", 0.9)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out(0).getAs[Long]("bench_id") === 100L)
    assert(out(0).getAs[Double]("max_cos") === 1.0)
  }

  test("cosine ties resolve to the lowest bench id") {
    // both bench vectors are parallel to the probe → cos = 1 with both
    val bench = df(200L -> Seq(2f, 0f), 150L -> Seq(3f, 0f))
    val out = SemanticDecontam.flag(df(1L -> Seq(1f, 0f)), bench,
      "id", "vec", 0.5).head()
    assert(out.getAs[Long]("bench_id") === 150L)
  }

  test("threshold comparison is >= (boundary row is flagged)") {
    val bench = df(100L -> Seq(1f, 0f))
    val corpus = df(1L -> Seq(1f, 1f)) // cos = 1/√2
    val cos = math.sqrt(0.5)
    val hit = SemanticDecontam.flag(corpus, bench, "id", "vec",
      SemanticDecontam.flag(corpus, bench, "id", "vec", 0.0)
        .head().getAs[Double]("max_cos")).collect()
    assert(hit.length === 1, s"row at exactly its own max_cos must flag (cos≈$cos)")
  }

  test("zero-norm vectors are excluded from both sides") {
    val bench = df(100L -> Seq(0f, 0f), 101L -> Seq(1f, 0f))
    val corpus = df(1L -> Seq(0f, 0f), 2L -> Seq(1f, 0f))
    val out = SemanticDecontam.flag(corpus, bench, "id", "vec", 0.5).collect()
    // corpus 1 (zero) never appears; corpus 2 matches bench 101 only
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    assert(out(0).getAs[Long]("bench_id") === 101L)
  }

  test("empty benchmark set flags nothing") {
    val out = SemanticDecontam.flag(df(1L -> Seq(1f, 0f)),
      df(), "id", "vec", 0.0)
    assert(out.count() === 0L)
  }

  test("the corpus side plans no shuffle join") {
    val bench = df(100L -> Seq(1f, 0f))
    val p = SemanticDecontam.flag(df(1L -> Seq(1f, 0f)), bench,
      "id", "vec", 0.5).queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"decontam shuffled the corpus:\n$p")
  }
}
