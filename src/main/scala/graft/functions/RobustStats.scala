package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Robust statistics UDAFs (SURVEY.md §2.10) as typed `Aggregator`s.
  *
  * The workhorse is the Q-Q (probability-plot) mean/rms estimator — THE
  * normalizer of the reference calibration path
  * (`fluxcal/lofar_fluxcal.py:200-211`, `fluxcal/snr.py:56-67`,
  * `dynsp.py:194-197`, `spspectra.py:10-22`, `pulse_info.py:18-28`,
  * `lba-flatten-bandpass.py:73-79`): order statistics of the sample are
  * regressed against normal-theory quantiles at Filliben plotting
  * positions, restricted to a central quantile band, giving a mean/rms
  * estimate that ignores the pulsed/RFI tail.
  *
  * Buffers hold the group's values (profile groups are bounded, nbin ≤
  * 4096 by construction — documented bound, SURVEY.md §7 "hard parts"),
  * so exact in-buffer sorting is safe. Groups are reduced distributed —
  * only per-group state, never a driver collect.
  */
object RobustStats {

  /** Inverse normal CDF — Acklam's rational approximation (|ε| < 1.15e-9),
    * the standard public-domain algorithm. */
  def normInv(p: Double): Double = {
    require(p > 0 && p < 1, s"p out of (0,1): $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }

  /** Filliben plotting position for 1-based rank i of n. */
  def fillibenPosition(i: Int, n: Int): Double =
    if (i == n) math.pow(0.5, 1.0 / n)
    else if (i == 1) 1 - math.pow(0.5, 1.0 / n)
    else (i - 0.3175) / (n + 0.365)

  /** (mean, rms) from a Q-Q fit of sorted values vs normal quantiles,
    * restricted to quantiles with |osm| <= osmBound (the reference's
    * inline variants use 1.0: `dynsp.py:196`). */
  def qqMeanRms(values: Array[Double], osmBound: Double = 1.0): (Double, Double) = {
    val n = values.length
    if (n == 0) return (Double.NaN, Double.NaN)
    if (n == 1) return (values(0), 0.0)
    val sorted = values.sorted
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0; var m = 0
    var i = 1
    while (i <= n) {
      val osm = normInv(fillibenPosition(i, n))
      if (math.abs(osm) <= osmBound) {
        val osr = sorted(i - 1)
        sx += osm; sy += osr; sxx += osm * osm; sxy += osm * osr; m += 1
      }
      i += 1
    }
    if (m < 2) return (sorted(n / 2), 0.0)
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val intercept = (sy - slope * sx) / m
    (intercept, slope) // mean = intercept, rms = slope
  }

  final case class MeanRms(mean: Double, rms: Double)

  /** Growable sample buffer: `data` has amortized-doubling slack beyond the
    * `n` live values, so `reduce` is O(1) amortized instead of the O(group)
    * full-array copy a naive `b :+ a` pays per element (A8 runs per
    * (obs,subint,pol,chan) cell — this is the hottest UDAF buffer). The
    * case-class wrapper stays cheap: reduce mutates `data` in place and
    * re-wraps, allocating only on growth. */
  final case class GrowBuf(n: Int, data: Array[Double])

  private val growEnc: Encoder[GrowBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[GrowBuf]()

  private def grown(b: GrowBuf, need: Int): Array[Double] =
    if (b.n + need <= b.data.length) b.data
    else java.util.Arrays.copyOf(b.data, math.max(b.data.length * 2, math.max(b.n + need, 16)))

  private def packed(b: GrowBuf): Array[Double] =
    if (b.n == b.data.length) b.data else java.util.Arrays.copyOf(b.data, b.n)

  private def concat(b1: GrowBuf, b2: GrowBuf): GrowBuf = {
    val out = new Array[Double](b1.n + b2.n)
    System.arraycopy(b1.data, 0, out, 0, b1.n)
    System.arraycopy(b2.data, 0, out, b1.n, b2.n)
    GrowBuf(b1.n + b2.n, out)
  }

  /** Collect-then-estimate aggregator core: subclasses provide finish. */
  abstract class BoundedSampleAgg[OUT: Encoder]
      extends Aggregator[Double, GrowBuf, OUT] {
    def zero: GrowBuf = GrowBuf(0, Array.empty)
    def reduce(b: GrowBuf, a: Double): GrowBuf = {
      val data = grown(b, 1)
      data(b.n) = a
      GrowBuf(b.n + 1, data)
    }
    def merge(b1: GrowBuf, b2: GrowBuf): GrowBuf = concat(b1, b2)
    final def finish(b: GrowBuf): OUT = finishValues(packed(b))
    def finishValues(r: Array[Double]): OUT
    def bufferEncoder: Encoder[GrowBuf] = growEnc
  }

  /** A8: Q-Q robust (mean, rms). */
  class QqAgg(osmBound: Double) extends BoundedSampleAgg[MeanRms]()(Encoders.product[MeanRms]) {
    def finishValues(r: Array[Double]): MeanRms = {
      val (m, s) = qqMeanRms(r, osmBound); MeanRms(m, s)
    }
    def outputEncoder: Encoder[MeanRms] = Encoders.product[MeanRms]
  }

  /** A12: trimmed std over the central fraction of sorted values with the
    * reference's small-sample correction ×1.148 (`pulsestack.py:74-76`). */
  class TrimmedStdAgg(keepFrac: Double, correction: Double)
      extends BoundedSampleAgg[Double]()(Encoders.scalaDouble) {
    def finishValues(r: Array[Double]): Double = {
      val n = r.length
      if (n < 2) return 0.0
      val sorted = r.sorted
      val drop = ((1 - keepFrac) / 2 * n).toInt
      val kept = sorted.slice(drop, n - drop)
      val mean = kept.sum / kept.length
      val v = kept.map(x => (x - mean) * (x - mean)).sum / kept.length
      math.sqrt(v) * correction
    }
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** A12 variant: mean/std over the lower half of sorted values
    * (`subdyn.py:426-427`). */
  class LowerHalfAgg extends BoundedSampleAgg[MeanRms]()(Encoders.product[MeanRms]) {
    def finishValues(r: Array[Double]): MeanRms = {
      val n = r.length
      if (n == 0) return MeanRms(Double.NaN, Double.NaN)
      val kept = r.sorted.take(math.max(n / 2, 1))
      val mean = kept.sum / kept.length
      val v = kept.map(x => (x - mean) * (x - mean)).sum / kept.length
      MeanRms(mean, math.sqrt(v))
    }
    def outputEncoder: Encoder[MeanRms] = Encoders.product[MeanRms]
  }

  /** A10: polynomial least-squares fit of value vs an implicit 0-based
    * index after sorting by the paired index column is NOT expressible on
    * a Double-only aggregator; the polynomial baseline ships as the
    * closed-form relational q45 and this degree-d fitter over (x, y)
    * pairs. Buffer holds interleaved [x0,y0,x1,y1,...]. */
  class PolyFitAgg(degree: Int)
      extends Aggregator[(Double, Double), GrowBuf, Seq[Double]] {
    def zero: GrowBuf = GrowBuf(0, Array.empty)
    def reduce(b: GrowBuf, a: (Double, Double)): GrowBuf = {
      val data = grown(b, 2)
      data(b.n) = a._1; data(b.n + 1) = a._2
      GrowBuf(b.n + 2, data)
    }
    def merge(b1: GrowBuf, b2: GrowBuf): GrowBuf = concat(b1, b2)
    def finish(buf: GrowBuf): Seq[Double] = {
      val r = packed(buf)
      val n = r.length / 2
      val k = degree + 1
      if (n < k) return Seq.fill(k)(Double.NaN)
      // normal equations A c = rhs with A[i][j] = sum x^(i+j)
      val pow = Array.ofDim[Double](2 * degree + 1)
      val rhs = Array.ofDim[Double](k)
      var i = 0
      while (i < n) {
        val x = r(2 * i); val y = r(2 * i + 1)
        var xp = 1.0; var j = 0
        while (j <= 2 * degree) { pow(j) += xp; xp *= x; j += 1 }
        xp = 1.0; j = 0
        while (j < k) { rhs(j) += xp * y; xp *= x; j += 1 }
        i += 1
      }
      val a = Array.tabulate(k, k)((r0, c0) => pow(r0 + c0))
      // Gaussian elimination with partial pivoting (k ≤ ~7)
      val c = rhs.clone()
      var col = 0
      while (col < k) {
        var piv = col
        var rr = col + 1
        while (rr < k) { if (math.abs(a(rr)(col)) > math.abs(a(piv)(col))) piv = rr; rr += 1 }
        val tmp = a(col); a(col) = a(piv); a(piv) = tmp
        val t2 = c(col); c(col) = c(piv); c(piv) = t2
        rr = col + 1
        while (rr < k) {
          val f = a(rr)(col) / a(col)(col)
          var cc = col
          while (cc < k) { a(rr)(cc) -= f * a(col)(cc); cc += 1 }
          c(rr) -= f * c(col)
          rr += 1
        }
        col = col + 1
      }
      val out = Array.ofDim[Double](k)
      var r2 = k - 1
      while (r2 >= 0) {
        var s = c(r2)
        var cc = r2 + 1
        while (cc < k) { s -= a(r2)(cc) * out(cc); cc += 1 }
        out(r2) = s / a(r2)(r2)
        r2 -= 1
      }
      out.toSeq // lowest-order coefficient first
    }
    def bufferEncoder: Encoder[GrowBuf] = growEnc
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  // ---- Column-level registrations ----

  /** qq_stats(value) → struct(mean, rms). */
  def qqStats(value: Column, osmBound: Double = 1.0): Column =
    udaf(new QqAgg(osmBound)).apply(value)

  /** trimmed_std(value) with central-95% keep and ×1.148 correction. */
  def trimmedStd(value: Column, keepFrac: Double = 0.95,
                 correction: Double = 1.148): Column =
    udaf(new TrimmedStdAgg(keepFrac, correction)).apply(value)

  /** lower_half_stats(value) → struct(mean, rms). */
  def lowerHalfStats(value: Column): Column =
    udaf(new LowerHalfAgg).apply(value)

  /** poly_fit(x, y) → array of degree+1 coefficients, lowest first. */
  def polyFit(x: Column, y: Column, degree: Int): Column =
    udaf(new PolyFitAgg(degree), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      .apply(x, y)
}
