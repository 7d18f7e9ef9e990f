package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import scala.util.Random

class RobustStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("normInv matches known quantiles of the standard normal") {
    assert(math.abs(RobustStats.normInv(0.5)) < 1e-9)
    assert(math.abs(RobustStats.normInv(0.975) - 1.959963985) < 1e-7)
    assert(math.abs(RobustStats.normInv(0.0228) - (-1.999077)) < 1e-4)
    assert(math.abs(RobustStats.normInv(0.001) - (-3.090232306)) < 1e-7)
    // symmetry
    assert(math.abs(RobustStats.normInv(0.3) + RobustStats.normInv(0.7)) < 1e-12)
  }

  test("filliben positions are monotone and symmetric-ish") {
    val n = 100
    val ps = (1 to n).map(RobustStats.fillibenPosition(_, n))
    assert(ps == ps.sorted)
    assert(ps.head > 0 && ps.last < 1)
    assert(math.abs(ps.head - (1 - ps.last)) < 1e-12)
  }

  test("qqMeanRms recovers (mu, sigma) of clean Gaussian samples") {
    val rng = new Random(7)
    val xs = Array.fill(5000)(rng.nextGaussian() * 2.0 + 5.0)
    val (m, s) = RobustStats.qqMeanRms(xs)
    assert(math.abs(m - 5.0) < 0.1, s"mean $m")
    assert(math.abs(s - 2.0) < 0.1, s"rms $s")
  }

  test("qqMeanRms is robust to a 10% pulsed tail (the design point)") {
    val rng = new Random(8)
    val clean = Array.fill(900)(rng.nextGaussian())
    val pulsed = Array.fill(100)(50.0 + rng.nextGaussian())
    val (m, s) = RobustStats.qqMeanRms(clean ++ pulsed)
    assert(math.abs(m) < 0.3, s"robust mean $m moved by the tail")
    assert(math.abs(s - 1.0) < 0.3, s"robust rms $s inflated by the tail")
    // the plain mean is dragged far off by the same tail
    val plain = (clean ++ pulsed).sum / 1000
    assert(plain > 4.0)
  }

  test("qqStats UDAF agrees with the direct function per group") {
    val rng = new Random(9)
    val data = for (g <- 0 until 3; _ <- 0 until 400)
      yield (g, rng.nextGaussian() * (g + 1) + g * 10.0)
    val df = data.toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(RobustStats.qqStats($"v").as("mr"))
      .select($"g", $"mr.mean", $"mr.rms")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val direct = data.groupBy(_._1).map { case (g, vs) =>
      val (m, s) = RobustStats.qqMeanRms(vs.map(_._2).toArray); (g, m, s)
    }.toSeq.sortBy(_._1)
    got.zip(direct).foreach { case ((g1, m1, s1), (g2, m2, s2)) =>
      assert(g1 == g2)
      assert(math.abs(m1 - m2) < 1e-9 && math.abs(s1 - s2) < 1e-9)
    }
  }

  test("qqStats is partition-count independent") {
    val rng = new Random(10)
    val df = (0 until 1000).map(i => (i % 4, rng.nextGaussian())).toDF("g", "v")
    def run(parts: Int) = df.repartition(parts).groupBy($"g")
      .agg(RobustStats.qqStats($"v").as("mr"))
      .select($"g", $"mr.mean").as[(Int, Double)].collect().sortBy(_._1).toSeq
    assert(run(1).zip(run(8)).forall { case ((_, a), (_, b)) => math.abs(a - b) < 1e-12 })
  }

  test("trimmedStd ignores extreme outliers, plain stddev does not") {
    val rng = new Random(11)
    val vs = Array.fill(980)(rng.nextGaussian()) ++ Array.fill(20)(100.0)
    val df = vs.toSeq.toDF("v")
    val trimmed = df.agg(RobustStats.trimmedStd($"v", keepFrac = 0.95, correction = 1.148))
      .as[Double].head()
    val plain = df.agg(stddev_pop($"v")).as[Double].head()
    assert(trimmed < 2.0, s"trimmed $trimmed")
    assert(plain > 10.0, s"plain $plain")
  }

  test("lowerHalfStats estimates noise floor under a bright tail") {
    val rng = new Random(12)
    val vs = Array.fill(500)(rng.nextGaussian()) ++ Array.fill(500)(20.0)
    val got = vs.toSeq.toDF("v")
      .agg(RobustStats.lowerHalfStats($"v").as("mr"))
      .select($"mr.mean").as[Double].head()
    assert(got < 1.0, s"lower-half mean $got")
  }

  test("polyFit recovers exact quadratic coefficients") {
    val data = (0 until 50).map { i =>
      val x = i.toDouble; (x, 3.0 + 0.5 * x - 0.02 * x * x)
    }
    val got = data.toDF("x", "y")
      .agg(RobustStats.polyFit($"x", $"y", 2)).as[Seq[Double]].head()
    assert(math.abs(got(0) - 3.0) < 1e-6)
    assert(math.abs(got(1) - 0.5) < 1e-8)
    assert(math.abs(got(2) + 0.02) < 1e-9)
  }
}
