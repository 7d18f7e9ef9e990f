package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpecBase {
  import spark.implicits._

  // Three well-separated direction clusters in 4-D (cosine geometry):
  // axis-aligned groups with small off-axis noise, 30 vectors each.
  private def fixture = {
    // ids interleave clusters (id % 3 = cluster) so the deterministic
    // lowest-id seeding starts with one seed per true cluster — the
    // caller's contract: seed ordering is the user's lever, not RNG
    val rows = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield {
      val base = Array.fill(4)(0.05f * ((i + c) % 3))
      base(c) = 1.0f
      (i * 3L + c, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("lloyd recovers separated direction clusters") {
    val cents = KMeans.lloyd(fixture, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.count() == 3)
    val assigned = KMeans.assign(fixture, "vec_id", "embedding", cents)
      .select($"vec_id", $"cid").as[(Long, Int)].collect()
    // every true cluster maps onto exactly one cell, partitioning the data
    val byTrue = assigned.groupBy(_._1 % 3)
    byTrue.foreach { case (trueC, members) =>
      assert(members.map(_._2).distinct.length == 1,
        s"true cluster $trueC split across cells")
    }
    assert(byTrue.map(_._2.head._2).toSet.size == 3, "cells collapsed")
  }

  test("zero iterations returns the k lowest-id seeds") {
    val cents = KMeans.lloyd(fixture, "vec_id", "embedding", k = 2, iters = 0)
      .orderBy($"cid").collect()
    assert(cents.length == 2)
    val seed0 = cents(0).getSeq[Float](cents(0).fieldIndex("centroid")).toList
    assert(seed0 == fixture.orderBy($"vec_id").select($"embedding")
      .as[Seq[Float]].head().toList)
  }

  test("assignment is exhaustive and exclusive over nonzero vectors") {
    val cents = KMeans.lloyd(fixture, "vec_id", "embedding", k = 3, iters = 2)
    val a = KMeans.assign(fixture, "vec_id", "embedding", cents)
    assert(a.count() == 90)
    assert(a.select($"vec_id").distinct().count() == 90)
    assert(a.agg(min($"cos")).as[Double].head() > 0.0)
  }

  test("zero vectors are excluded rather than assigned arbitrarily") {
    val withZero = fixture.union(Seq((999L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val cents = KMeans.lloyd(withZero, "vec_id", "embedding", k = 3, iters = 1)
    val a = KMeans.assign(withZero, "vec_id", "embedding", cents)
    assert(!a.select($"vec_id").as[Long].collect().contains(999L))
  }
}
