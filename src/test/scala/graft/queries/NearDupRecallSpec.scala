package graft.queries

import graft.SparkSpecBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** LSH banding is a recall/fan-out trade, and round 5 moved the default
  * toward fan-out (3 bands × 8 rows: per-band collision probability J⁸).
  * This suite pins the RECALL side of that trade against ground truth —
  * the brute-force all-pairs exact Jaccard at sf0.001 — so the banding
  * can never silently drift into missing the pairs dedup exists for:
  *
  *  - pairs at J ≥ 0.95 (near-exact duplicates — re-crawls, trivial
  *    edits) must ALL be found: a J ≥ 0.95 pair agrees on a full 8-row
  *    band with probability ≥ 1−(1−0.95⁸)³ ≈ 0.93 per the iid model,
  *    but real near-exact pairs share almost every minhash, and the
  *    corpus's actual dup families make this deterministic — assert
  *    recall = 1.0 so any regression is loud;
  *  - overall recall at the J ≥ 0.5 gate is reported and floored
  *    loosely (≥ 0.5): mid-band pairs are probabilistic by design and
  *    the number is corpus-dependent — the assertion documents the
  *    measured level rather than pretending the S-curve away.
  */
class NearDupRecallSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private lazy val (found, truth): (Set[(Long, Long)], Map[(Long, Long), Double]) = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (pairs, cleanup) = SimilarityQ.lshNearDupPairsScoped(docs, hinted = true)
    val got = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    cleanup()
    val sets = docs.select(col("doc_id"),
        array_sort(array_distinct(transform(array_distinct(tokens(col("text"))), strHash(_))))
          .as("toks"))
      .withColumn("n", size(col("toks")).cast(LongType))
      .filter(col("n") > 0).cache()
    val all = sets.as("x").join(sets.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("ni",
        call_function("sorted_intersect_count", col("x.toks"), col("y.toks")).cast(LongType))
      .withColumn("j", col("ni").cast("double") /
        (col("x.n") + col("y.n") - col("ni")).cast("double"))
      .filter(col("j") >= 0.5)
      .select(col("x.doc_id"), col("y.doc_id"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    sets.unpersist()
    (got, all)
  }

  test("every near-exact pair (J >= 0.95) survives the wide banding") {
    val nearExact = truth.filter(_._2 >= 0.95).keySet
    assert(nearExact.nonEmpty, "contract is vacuous: no near-exact pairs at sf0.001")
    val missed = nearExact -- found
    assert(missed.isEmpty,
      s"wide banding missed ${missed.size}/${nearExact.size} near-exact pairs: ${missed.take(5)}")
  }

  test("found pairs are a subset of ground truth (no false positives survive verify)") {
    val extra = found -- truth.keySet
    assert(extra.isEmpty, s"verified pairs not in ground truth: ${extra.take(5)}")
  }

  test("overall recall at the J >= 0.5 gate is measured and floored") {
    val recall = found.size.toDouble / truth.size
    info(f"wide-banding recall at J >= 0.5: ${found.size}/${truth.size} = $recall%.3f")
    assert(recall >= 0.5,
      f"recall $recall%.3f fell below the documented floor — banding drifted")
  }
}
