package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV sketch contracts: below k the sketch IS the exact distinct set;
  * above k it equals the window-rank min-k (the oracle plan) bitwise; the
  * cardinality estimate is within the advertised error of the exact
  * count; and the merge path (multi-partition input) changes nothing —
  * the aggregator is a monoid, which is what licenses map-side partial
  * aggregation at scale.
  */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 64

  // deterministic uniform longs in [0, HashMod). The KMV estimator is an
  // order-statistics argument that needs WELL-MIXED hashes — a poly hash
  // of short sequential strings is affine in the digits and fails it (a
  // real finding from this spec's first draft); q125 hashes multi-word
  // shingles, whose entropy the mixing here stands in for.
  private def hashes(n: Int, seed: Long): Seq[(String, Long)] = {
    val rnd = new java.util.SplittableRandom(seed)
    (0 until n).map { i =>
      (Seq("a", "b", "c")(i % 3), rnd.nextLong(TextFunctions.HashMod))
    }
  }

  test("below k the sketch is the exact sorted distinct set") {
    val rows = Seq(("g", 5L), ("g", 3L), ("g", 5L), ("g", 9L), ("g", 1L))
    val out = rows.toDF("g", "h").groupBy($"g")
      .agg(Sketches.kmvMinK($"h", k).as("mins"))
      .as[(String, Seq[Long])].collect().head._2
    assert(out == Seq(1L, 3L, 5L, 9L))
  }

  test("above k the sketch equals the window-rank min-k bitwise, merge-invariant") {
    val df = hashes(5000, 41L).toDF("g", "h")
    // exact min-k per group via the rank-window plan (the oracle's shape)
    val w = Window.partitionBy($"g").orderBy($"h".asc)
    val expect = df.distinct()
      .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .groupBy($"g").agg(sort_array(collect_list($"h")).as("mins"))
      .as[(String, Seq[Long])].collect().toMap
    // sketch over 1 partition and over 13 — the merge path must not matter
    Seq(1, 13).foreach { parts =>
      val got = df.repartition(parts).groupBy($"g")
        .agg(Sketches.kmvMinK($"h", k).as("mins"))
        .as[(String, Seq[Long])].collect().toMap
      assert(got == expect, s"min-k diverges from rank window at $parts partitions")
    }
  }

  test("cardinality estimate is within 4 standard errors of exact") {
    val df = hashes(20000, 42L).toDF("g", "h")
    val exact = df.distinct().groupBy($"g").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val est = df.groupBy($"g")
      .agg(Sketches.kmvMinK($"h", k).as("mins"))
      .select($"g", element_at($"mins", size($"mins")).as("hk"), size($"mins").as("nm"))
      .as[(String, Long, Int)].collect()
    est.foreach { case (g, hk, nm) =>
      assert(nm == k, s"group $g has fewer than k distinct hashes — bad fixture")
      val e = (k - 1).toDouble * TextFunctions.HashMod / hk
      val rse = 4.0 / math.sqrt(k - 2) // 4σ of the KMV estimator
      assert(math.abs(e - exact(g)) <= rse * exact(g),
        s"group $g: estimate $e vs exact ${exact(g)} beyond 4σ")
    }
  }

  test("duplicate-heavy input cannot inflate the sketch (distinctness)") {
    val rows = (0 until 1000).map(i => ("g", (i % 10).toLong))
    val out = rows.toDF("g", "h").repartition(7).groupBy($"g")
      .agg(Sketches.kmvMinK($"h", k).as("mins"))
      .as[(String, Seq[Long])].collect().head._2
    assert(out == (0L until 10L), "duplicates leaked into the min-k set")
  }

  // ----------------------------------------------- quantile sketch

  test("quantile sample below k is the whole group: quantiles exact") {
    val rows = Seq(7.0, 1.0, 5.0, 3.0, 9.0).zipWithIndex
      .map { case (v, i) => ("g", Sketches.SampleHashA * (i + 1), v) }
    val out = rows.toDF("g", "h", "v").groupBy($"g")
      .agg(Sketches.quantileSample($"h", $"v", k).as("s"))
      .as[(String, Seq[Double])].collect().head._2
    assert(out == Seq(1.0, 3.0, 5.0, 7.0, 9.0))
  }

  test("quantile sample above k equals the rank-window sample, merge-invariant, keeps duplicates") {
    val rnd = new java.util.SplittableRandom(43L)
    // duplicate (h, v) pairs on purpose: the sample is a MULTISET
    val base = (0 until 3000).map { i =>
      ("g" + (i % 2), rnd.nextLong(TextFunctions.HashMod),
        math.rint(rnd.nextDouble() * 50) / 10.0)
    }
    val rows = base ++ base.take(200)
    val df = rows.toDF("g", "h", "v")
    val w = Window.partitionBy($"g").orderBy($"h".asc, $"v".asc)
    val expect = df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .groupBy($"g").agg(sort_array(collect_list($"v")).as("s"))
      .as[(String, Seq[Double])].collect().toMap
    Seq(1, 13).foreach { parts =>
      val got = df.repartition(parts).groupBy($"g")
        .agg(Sketches.quantileSample($"h", $"v", k).as("s"))
        .as[(String, Seq[Double])].collect().toMap
      assert(got == expect, s"sample diverges from rank window at $parts partitions")
    }
  }

  test("quantile estimates are within 3 sigma of the exact rank") {
    val kk = 256
    val n = 50000
    val rnd = new java.util.SplittableRandom(44L)
    // skewed continuous measure (exp of a uniform) — a distribution where
    // naive midpoint guesses fail but rank sampling must not
    val rows = (0 until n).map { i =>
      ("g", rnd.nextLong(TextFunctions.HashMod), math.exp(rnd.nextDouble() * 5))
    }
    val df = rows.toDF("g", "h", "v").repartition(8)
    val sample = df.groupBy($"g")
      .agg(Sketches.quantileSample($"h", $"v", kk).as("s"))
      .as[(String, Seq[Double])].collect().head._2
    assert(sample.length == kk)
    val sorted = rows.map(_._3).sorted
    for (p <- Seq(0.5, 0.9)) {
      val est = sample((math.ceil(p * kk) - 1).toInt)
      // empirical CDF position of the estimate in the FULL data
      val rank = sorted.count(_ <= est).toDouble / n
      val tol = 3.0 * math.sqrt(p * (1 - p) / kk)
      assert(math.abs(rank - p) <= tol,
        s"p=$p: estimate $est sits at rank $rank, beyond 3 sigma ($tol)")
    }
  }
}
