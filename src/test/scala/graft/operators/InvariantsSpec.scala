package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import scala.util.Random

/** Property-style invariants (SURVEY.md §5 item 4): seeded randomized
  * cases, deterministic across runs. */
class InvariantsSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new Random(2024)

  private lazy val cube = {
    val c = CubeFixture.build(spark, CubeFixture.Spec(nsubint = 12, nchan = 12, nbin = 64))
    Cube(c.samples.cache(), c.weights.cache())
  }

  test("rotation: any shift composed with its inverse is the identity, sum preserved") {
    val total = cube.samples.agg(sum($"value")).as[Double].head()
    for (_ <- 1 to 5) {
      val k = rng.nextInt(63) + 1
      val round = ProfileOps.rotate(ProfileOps.rotate(cube, k, 64), 64 - k, 64)
      val totalAfter = round.samples.agg(sum($"value")).as[Double].head()
      assert(math.abs(total - totalAfter) < 1e-9, s"shift $k changed the sum")
      val diffs = round.samples.as("a")
        .join(cube.samples.as("b"),
          Seq("obs_id", "subint", "pol", "chan", "bin"))
        .filter(abs($"a.value" - $"b.value") > 1e-12).count()
      assert(diffs == 0, s"shift $k not invertible")
    }
  }

  test("scrunch composition law holds for random factor pairs") {
    for (_ <- 1 to 3) {
      val (k, m) = (Seq(2, 3)(rng.nextInt(2)), 2)
      val once = ProfileOps.tscrunch(cube, k * m)
      val twice = ProfileOps.tscrunch(ProfileOps.tscrunch(cube, k), m)
      val mism = once.samples.as("a")
        .join(twice.samples.as("b"), Seq("obs_id", "subint", "pol", "chan", "bin"))
        .filter(abs($"a.value" - $"b.value") > 1e-9).count()
      assert(mism == 0, s"tscrunch($k)∘tscrunch($m) != tscrunch(${k * m})")
    }
  }

  test("dedisperse at DM then -DM is the identity") {
    val d1 = ProfileOps.dedisperse(cube, 25.0, 110.0, 5.0, 170.0, 0.01, 64)
    val d2 = ProfileOps.dedisperse(d1, -25.0, 110.0, 5.0, 170.0, 0.01, 64)
    val diffs = d2.samples.as("a")
      .join(cube.samples.as("b"), Seq("obs_id", "subint", "pol", "chan", "bin"))
      .filter(abs($"a.value" - $"b.value") > 1e-12).count()
    assert(diffs == 0)
  }

  test("island detection is invariant under input partitioning") {
    val prof = ProfileOps.totalProfile(cube)
    def run(parts: Int) =
      ProfileOps.onPulseWindow(prof.repartition(parts))
        .select($"bin_lo", $"bin_hi", $"width")
        .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("qq normalization is idempotent-ish: re-normalizing is ~identity") {
    val n1 = ProfileOps.qqNormalize(cube)
    val n2 = ProfileOps.qqNormalize(Cube(n1.samples.cache(), n1.weights))
    // after the first pass the off-pulse is already N(0,1): second-pass
    // mean shift must be tiny
    val shift = n1.samples.as("a")
      .join(n2.samples.as("b"), Seq("obs_id", "subint", "pol", "chan", "bin"))
      .agg(avg(abs($"a.value" - $"b.value"))).as[Double].head()
    assert(shift < 0.2, s"second normalization moved values by $shift")
  }

  test("strHash native == algebraic on random ASCII strings incl. edge chars") {
    val cases = (1 to 300).map { _ =>
      val len = rng.nextInt(60)
      (1 to len).map(_ => (rng.nextInt(95) + 32).toChar).mkString
    } :+ "" :+ " " :+ "~~~" :+ ("\t tab")
    val df = cases.toDF("s")
    val bad = df.select(
        TextFunctions.strHash($"s").as("n"),
        TextFunctions.strHashColumnAlgebra($"s").as("a"))
      .filter($"n" =!= $"a").count()
    assert(bad == 0)
  }

  test("fold of a shifted series shifts the profile (time invariance)") {
    val period = 1.0; val n = 5000
    // the +0.0013 offset keeps samples off exact bin boundaries, where a
    // one-ulp difference between (t−t0)/P evaluations could flip the bin
    def series(t0: Double) = (0 until n).map { i =>
      val t = i * 0.01 + 0.0013 + t0
      (t, math.sin(2 * math.Pi * t))
    }.toDF("t", "v")
    // folding from a t0 offset by exactly one period gives the same profile
    val a = ProfileOps.fold(series(0.0), "t", "v", 0.0, period, 20)
      .orderBy($"ibin").select($"profile").as[Double].collect()
    val b = ProfileOps.fold(series(0.0), "t", "v", period * 3, period, 20)
      .orderBy($"ibin").select($"profile").as[Double].collect()
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }
}
