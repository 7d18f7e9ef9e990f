package graft.queries

import graft.SparkSpecBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round 5 made the WIDE banding schemes the default near-dup
  * generators (q32: 3×8-row MinHash bands; q62: 4×15-bit SimHash
  * bands) because fixed narrow blocks were the engine's one measured
  * scale-killer. The narrow forms stay behind as EXPLICIT CONTRACTS —
  * this suite pins them, so the pigeonhole/banding algebra is proven at
  * every width, not just the registered ones:
  *
  *  - narrow MinHash (2 bands × 4 rows over the K=8 prefix): the
  *    first-matching-band join must equal the naive banded candidate
  *    set (all band matches, distinct) + exact-Jaccard verify;
  *  - narrow SimHash (32-bit, 4×8-bit bands): the blocked join must
  *    equal the brute-force all-pairs Hamming scan — the pigeonhole
  *    argument is exactness, not approximation.
  */
class NarrowBandContractSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("narrow 2x4 MinHash banding: first-matching-band join equals naive banded LSH") {
    val (got, cleanup) = SimilarityQ.lshNearDupPairsScoped(
      docs, hinted = true, threshold = 0.5, bands = 2, rows = 4)
    val gotPairs = got.select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    // reference: same signatures, but candidates via ALL band matches +
    // distinct — no first-matching-band trick, no size prune
    val sig = docs
      .select(col("doc_id"),
        array_sort(array_distinct(transform(array_distinct(tokens(col("text"))), strHash(_))))
          .as("toks"))
      .withColumn("n", size(col("toks")).cast(LongType))
      .withColumn("bkt", SimilarityQ.bucketVectorOf(2, 4))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(col("bkt")).as(Seq("band", "bucket")))
      .cache()
    val cand = sig.as("x").join(sig.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.toks").as("ta"), col("y.toks").as("tb"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .distinct()
    val want = cand
      .withColumn("ni", call_function("sorted_intersect_count", col("ta"), col("tb")).cast(LongType))
      .withColumn("j", col("ni").cast("double") / (col("na") + col("nb") - col("ni")).cast("double"))
      .filter(col("j") >= 0.5)
      .select("doc_a", "doc_b", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    sig.unpersist()
    cleanup()
    assert(gotPairs.nonEmpty, "contract is vacuous: no narrow-band pairs at sf0.001")
    assert(gotPairs.sameElements(want),
      s"narrow banding diverged: got ${gotPairs.length} vs naive ${want.length}")
  }

  test("narrow 32-bit SimHash blocking equals the brute-force Hamming scan") {
    val got = ScaleQ.simhash32Pairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val sig = docs.select(col("doc_id"),
      call_function("simhash32",
        transform(array_distinct(tokens(col("text"))), strHash(_))).as("simhash"))
    val want = sig.as("x").join(sig.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming",
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast(LongType))
      .filter(col("hamming") <= 3)
      .select(col("x.doc_id"), col("y.doc_id"), col("hamming")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty, "contract is vacuous: no Hamming<=3 pairs at sf0.001")
    assert(got.sameElements(want),
      s"pigeonhole blocking diverged from brute force: ${got.length} vs ${want.length}")
  }

  test("wide SimHash banding rejects an uncovered or unguaranteed scheme") {
    intercept[IllegalArgumentException] {
      ScaleQ.simhash60Pairs(docs, bands = 4, bits = 12, maxHam = 3)
    }
    intercept[IllegalArgumentException] {
      ScaleQ.simhash60Pairs(docs, bands = 4, bits = 15, maxHam = 4)
    }
  }
}
