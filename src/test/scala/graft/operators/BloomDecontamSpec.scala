package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The sketch-gate contracts that make q114's shared-oracle move sound:
  * no false negatives, deterministic serialized layout, and the gate's
  * row-set is a superset of the true-overlap row-set. */
class BloomDecontamSpec extends SparkSpecBase {
  import spark.implicits._

  private val members = (1L to 500L).map(_ * 7919L)

  test("a built filter never rejects an inserted member") {
    val bits = BloomDecontam.trainBits(members.toDF("h"), "h", 1000L, 10000L)
    val hits = members.toDF("h")
      .filter(BloomDecontam.mightContain(bits, col("h")))
      .count()
    assert(hits === members.size)
  }

  test("serialized filter bytes are partitioning-invariant (bit-OR merge commutes)") {
    val a = BloomDecontam.trainBits(members.toDF("h").repartition(1), "h", 1000L, 10000L)
    val b = BloomDecontam.trainBits(members.toDF("h").repartition(7, col("h")), "h", 1000L, 10000L)
    assert(java.util.Arrays.equals(a, b))
  }

  test("anyHit gates a superset of rows with true overlap") {
    val bits = BloomDecontam.trainBits(members.toDF("h"), "h", 1000L, 10000L)
    val docs = Seq(
      (1L, Array(7919L, 3L)),          // true overlap
      (2L, Array(2L, 4L)),             // no overlap — may or may not pass the gate
      (3L, Array(500L * 7919L))        // true overlap
    ).toDF("doc_id", "sh")
    val gated = docs.filter(BloomDecontam.anyHit(bits, col("sh")))
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 3L).subsetOf(gated))
    // and the two-tier result equals the exact tier alone
    val exact = docs
      .withColumn("hit", size(array_intersect(col("sh"), lit(members.toArray))) > 0)
      .filter(col("hit")).select("doc_id").as[Long].collect().toSet
    val twoTier = docs.filter(BloomDecontam.anyHit(bits, col("sh")))
      .withColumn("hit", size(array_intersect(col("sh"), lit(members.toArray))) > 0)
      .filter(col("hit")).select("doc_id").as[Long].collect().toSet
    assert(twoTier === exact)
  }
}
