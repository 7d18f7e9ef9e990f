package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GridInterpSpec extends SparkSpecBase {
  import spark.implicits._

  // tiny regular grid: freq 110..120 step 5 (3 points), el 0..3 step 1,
  // v = 100*fi + ei so corners are recognizable
  private lazy val grid = (for (fi <- 0 to 2; ei <- 0 to 3)
    yield (110.0 + 5.0 * fi, ei.toDouble, 100.0 * fi + ei))
    .toDF("freq", "el", "v")

  private def interp(freq: Double, el: Double): Double =
    GridInterp.bilinear(
      Seq((freq, el)).toDF("freq", "el"), grid, "freq", "el", "out",
      flow = 110.0, fstep = 5.0, fhigh = 120.0, elMax = 3)
      .select($"out").as[Double].head()

  test("exact grid points return table values untouched") {
    assert(interp(110.0, 0.0) === 0.0)
    assert(interp(115.0, 2.0) === 102.0)
    assert(interp(120.0, 3.0) === 203.0)
  }

  test("interior points match the closed-form bilinear value") {
    // freq 112.5 (wf=0.5), el 1.5 (we=0.5): corners 1,2,101,102 → 51.5
    assert(interp(112.5, 1.5) === 51.5)
    // pure freq interpolation at exact el
    assert(interp(111.0, 2.0) === (2.0 + 0.2 * 100.0))
    // pure el interpolation at exact freq
    assert(interp(115.0, 0.25) === 100.25)
  }

  test("top edges clamp instead of reading outside the table") {
    // freq = fhigh: fi0 = fi1 = last column, weight 0
    assert(interp(120.0, 1.5) === 201.5)
    // el = elMax
    assert(interp(112.5, 3.0) === 53.0)
  }
}
