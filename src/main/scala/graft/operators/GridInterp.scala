package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J8: bilinear interpolating lookup on a small regular 2-D grid
  * (`fluxcal/lofar_gain.py:84-128`): the gain table is (freq, el) with
  * freq on flow..fhigh step fstep and el on 0..elMax step 1; each probe
  * row interpolates linearly in freq at the two bracketing elevations,
  * then linearly in el — exactly the reference's nested np.interp order.
  *
  * Plan shape: the grid is a broadcast dimension; the four corner lookups
  * are four broadcast hash joins on integer (freq-index, el-index) keys —
  * fully map-side, no shuffle of the probe stream, works unchanged when
  * probes are 100 TB. Exact-on-grid probes degrade to weight 0/1 and the
  * top/right edges clamp (the reference only ever evaluates inside the
  * table's domain).
  */
object GridInterp {

  /** @param probes rows carrying `freqCol` (MHz) and `elCol` (deg)
    * @param grid   dimension with columns (freq, el, v) on the regular grid
    * @param out    name of the interpolated output column */
  def bilinear(probes: DataFrame, grid: DataFrame,
               freqCol: String, elCol: String, out: String,
               flow: Double = 110.0, fstep: Double = 5.0,
               fhigh: Double = 250.0, elMax: Int = 90): DataFrame = {
    val nf = math.round((fhigh - flow) / fstep).toInt // max freq index
    def cornerDim(fiName: String, eiName: String, vName: String): DataFrame =
      grid.select(
        round((col("freq") - flow) / fstep).cast("int").as(fiName),
        round(col("el")).cast("int").as(eiName),
        col("v").as(vName))

    val fi0 = least(greatest(floor((col(freqCol) - flow) / fstep).cast("int"),
      lit(0)), lit(nf))
    val fi1 = least(fi0 + 1, lit(nf))
    val ei0 = least(greatest(floor(col(elCol)).cast("int"), lit(0)), lit(elMax))
    val ei1 = least(ei0 + 1, lit(elMax))

    val p = probes
      .withColumn("__fi0", fi0).withColumn("__fi1", fi1)
      .withColumn("__ei0", ei0).withColumn("__ei1", ei1)
      .withColumn("__f0", lit(flow) + lit(fstep) * col("__fi0"))
      .withColumn("__f1", lit(flow) + lit(fstep) * col("__fi1"))

    val joined = p
      .join(broadcast(cornerDim("__fi0", "__ei0", "__g00")), Seq("__fi0", "__ei0"))
      .join(broadcast(cornerDim("__fi1", "__ei0", "__g10")), Seq("__fi1", "__ei0"))
      .join(broadcast(cornerDim("__fi0", "__ei1", "__g01")), Seq("__fi0", "__ei1"))
      .join(broadcast(cornerDim("__fi1", "__ei1", "__g11")), Seq("__fi1", "__ei1"))

    // np.interp order (lofar_gain.py:121-123): interpolate in freq at the
    // lower and upper elevation rows, then in elevation between those.
    // Weights CLAMP to [0, 1]: probes outside the grid domain take the
    // edge value like np.interp, never a negative-weight extrapolation
    // (an LBA-band probe below flow would otherwise wildly extrapolate).
    def clamp01(c: Column): Column = least(greatest(c, lit(0.0)), lit(1.0))
    val wf: Column = when(col("__f1") > col("__f0"),
      clamp01((col(freqCol) - col("__f0")) / (col("__f1") - col("__f0"))))
      .otherwise(0.0)
    val lo = col("__g00") + wf * (col("__g10") - col("__g00"))
    val hi = col("__g01") + wf * (col("__g11") - col("__g01"))
    val we: Column = when(col("__ei1") > col("__ei0"),
      clamp01((col(elCol) - col("__ei0")) / (col("__ei1") - col("__ei0"))))
      .otherwise(0.0)

    joined
      .withColumn(out, lo + we * (hi - lo))
      .drop("__fi0", "__fi1", "__ei0", "__ei1", "__f0", "__f1",
        "__g00", "__g10", "__g01", "__g11")
  }
}
