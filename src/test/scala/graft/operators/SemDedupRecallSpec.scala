package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Cluster blocking (q92 / [[SemanticDedup]]) is a recall/candidate-
  * volume trade exactly like LSH banding, and this suite pins its
  * RECALL against ground truth — the brute-force all-pairs exact cosine
  * over the sf0.001 embeddings — the same discipline NearDupRecallSpec
  * applies to the MinHash bands:
  *
  *  - found pairs must be a SUBSET of ground truth (the exact-cosine
  *    verify filter means blocking can lose pairs but never invent
  *    them);
  *  - the HIGH-similarity tier (cos ≥ 0.45; the corpus max is ~0.479,
  *    so this is its top band) must be found essentially completely —
  *    the SemDeDup working hypothesis is that high-cosine pairs
  *    co-locate in a shared cell, and if that drifts the operator is
  *    silently not doing its job (measured: 7/7 at the registered
  *    nprobe=3, vs 1/7 single-cell — the knob exists because of this
  *    measurement);
  *  - overall recall at the registered t = 0.35 gate is measured and
  *    floored — mid-band pairs straddle cell neighborhoods by design
  *    (the price of ~nprobe²/k of all-pairs candidates), so the floor
  *    documents the measured level (84%; 27% single-cell) rather than
  *    pretending the trade away.
  */
class SemDedupRecallSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val threshold = 0.35

  private lazy val (found, truth): (Set[(Long, Long)], Map[(Long, Long), Double]) = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 16, iters = 2)
    val asgTop = KMeans.assignTop(emb, "vec_id", "embedding", cents, nprobe = 3)
    val got = SemanticDedup.pairs(emb, "vec_id", "embedding", asgTop, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("norm", sqrt(call_function("float_dot", col("embedding"), col("embedding"))))
      .filter(col("norm") > 0.0).cache()
    val all = vecs.as("x").join(vecs.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos",
        call_function("float_dot", col("x.embedding"), col("y.embedding")) /
          (col("x.norm") * col("y.norm")))
      .filter(col("cos") >= threshold)
      .select(col("x.vec_id"), col("y.vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    vecs.unpersist()
    (got, all)
  }

  test("found pairs are a subset of ground truth (verify filter admits no false positives)") {
    assert(truth.nonEmpty, "contract is vacuous: no pairs at the threshold")
    val invented = found -- truth.keySet
    assert(invented.isEmpty, s"blocking invented ${invented.size} pairs: ${invented.take(5)}")
  }

  test("the high-similarity tier co-locates: recall at cos >= 0.45") {
    val tier = truth.filter(_._2 >= 0.45).keySet
    assert(tier.nonEmpty, "contract is vacuous: no pairs at cos >= 0.45")
    val recall = (tier & found).size.toDouble / tier.size
    info(f"high-tier recall: ${(tier & found).size}/${tier.size} = $recall%.2f")
    assert(recall >= 0.85,
      s"high-similarity pairs no longer co-locate: recall $recall")
  }

  test("overall recall at the registered gate is at the measured level") {
    val recall = (truth.keySet & found).size.toDouble / truth.size
    info(f"overall recall at t=$threshold: ${(truth.keySet & found).size}/${truth.size} = $recall%.2f")
    assert(recall >= 0.6, s"overall recall collapsed: $recall")
  }
}
