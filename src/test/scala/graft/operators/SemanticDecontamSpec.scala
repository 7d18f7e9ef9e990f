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

  test("index-backed flagging: no false positives, understated max only, pinned recall") {
    // Real corpus (sf0.001): bench = every 97th vector, corpus = the
    // rest, indexed under a 4-cell IVF. flagIndexed probes 3 of 4 cells
    // per bench vector, so it may MISS cross-cell contamination but can
    // never invent it — every reported row must be exactly a row the
    // one-pass flag reports, with max_cos ≤ the exact max (a partner in
    // an unprobed cell can only lower the reported max).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 97 =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val bench = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val threshold = 0.30
    val exact = SemanticDecontam.flag(corpus, bench, "id", "vec", threshold)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(exact.nonEmpty, "fixture produced no exact contamination")
    val dir = tempDir("decontam_idx")
    val cents = KMeans.lloyd(corpus, "id", "vec", k = 4, iters = 1)
    VecIndex.build(corpus, "id", "vec", cents, dir)
    val got = SemanticDecontam.flagIndexed(VecIndex.open(spark, dir), cents,
        bench, "id", "vec", threshold, nprobe = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got.foreach { case (id, (bId, cos)) =>
      assert(exact.contains(id), s"false positive: corpus $id")
      assert(cos <= exact(id)._2 + 1e-12,
        s"index path overstated max_cos for $id: $cos > ${exact(id)._2}")
      if (cos == exact(id)._2)
        assert(bId == exact(id)._1, s"tie-break diverged for $id")
    }
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.75,
      f"index-backed recall $recall%.2f below floor (${got.size}/${exact.size})")
  }

  test("the index-backed plan partition-prunes to the probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 97 =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val bench = emb.filter(col("vec_id") % 97 === 0).limit(2)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val dir = tempDir("decontam_prune")
    val cents = KMeans.lloyd(corpus, "id", "vec", k = 4, iters = 1)
    VecIndex.build(corpus, "id", "vec", cents, dir)
    val p = SemanticDecontam.flagIndexed(VecIndex.open(spark, dir), cents,
        bench, "id", "vec", 0.30, nprobe = 2)
      .queryExecution.executedPlan.toString
    // the bench-side parquet scan is unpartitioned (its PartitionFilters
    // is legitimately empty) — the assertion targets the INDEX scan: a
    // non-trivial cid IN (...) must reach its partition filter
    assert("PartitionFilters: \\[cid#\\d+ IN \\(".r.findFirstIn(p).isDefined,
      s"index scan not pruned to probed cells:\n$p")
  }
}
