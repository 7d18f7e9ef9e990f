package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

/** Deterministic synthetic archive cube (FIXTURES.md §1): Gaussian noise
  * + an injected Gaussian pulse whose arrival bin drifts with the
  * dispersion delay per channel, + zapped cells. Small (test-sized) so
  * driver-side generation is fine; the engine under test only ever sees
  * the resulting DataFrames.
  */
object CubeFixture {
  final case class Spec(
      obsId: String = "L123456",
      nsubint: Int = 8,
      npol: Int = 1,
      nchan: Int = 16,
      nbin: Int = 128,
      noiseSigma: Double = 1.0,
      pulseAmp: Double = 12.0,
      pulseBin: Int = 40,
      pulseSigmaBins: Double = 2.5,
      dm: Double = 0.0,
      f0Mhz: Double = 110.0,
      chanBwMhz: Double = 5.0,
      tbinSec: Double = 0.01,
      zapped: Seq[(Int, Int)] = Seq((0, 3), (5, 7)),
      seed: Long = 42L)

  /** Dispersion arrival delay in bins for a channel (same formula as the
    * engine's R2 operator, used here to *inject* the drift). */
  def delayBins(spec: Spec, chan: Int): Int = {
    val f = spec.f0Mhz + chan * spec.chanBwMhz
    val fRef = spec.f0Mhz + spec.nchan * spec.chanBwMhz
    val delayMs = (1.0e7 * spec.dm / 2.41) * (1.0 / (f * f) - 1.0 / (fRef * fRef))
    math.round(delayMs / 1000.0 / spec.tbinSec).toInt
  }

  def build(spark: SparkSession, spec: Spec): Cube = {
    import spark.implicits._
    val rng = new Random(spec.seed)
    val rows = for {
      s <- 0 until spec.nsubint
      p <- 0 until spec.npol
      c <- 0 until spec.nchan
      b <- 0 until spec.nbin
    } yield {
      val centre = (spec.pulseBin + delayBins(spec, c)) % spec.nbin
      // circular distance so the pulse wraps cleanly
      val d0 = math.abs(b - centre)
      val d = math.min(d0, spec.nbin - d0)
      val pulse = spec.pulseAmp *
        math.exp(-d * d / (2 * spec.pulseSigmaBins * spec.pulseSigmaBins))
      val v = rng.nextGaussian() * spec.noiseSigma + pulse
      (spec.obsId, s, p, c, b, v)
    }
    val samples = rows.toDF("obs_id", "subint", "pol", "chan", "bin", "value")
    val weights = (for {
      s <- 0 until spec.nsubint
      c <- 0 until spec.nchan
    } yield {
      val w = if (spec.zapped.contains((s, c))) 0.0 else 1.0 + 0.1 * (s % 3)
      (spec.obsId, s, c, w)
    }).toDF("obs_id", "subint", "chan", "weight")
    Cube(samples, weights)
  }

  def durations(spark: SparkSession, spec: Spec): DataFrame = {
    import spark.implicits._
    (0 until spec.nsubint).map(s => (spec.obsId, s, 10.0 + (s % 2)))
      .toDF("obs_id", "subint", "dur")
  }
}
