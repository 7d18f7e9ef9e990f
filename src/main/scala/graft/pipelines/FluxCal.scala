package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Cube, ProfileOps}
import graft.functions.AstroFunctions._

/** The flagship calibration pipeline — the Spark-first re-expression of
  * `fluxcal/lofar_fluxcal.py` §3.2 (SURVEY.md):
  *
  *  1. weight re-normalization (A7) + RFI fraction (A6)
  *  2. incoherent dedispersion (R2)
  *  3. per-cell Q-Q normalization (A8)
  *  4. radiometer calibration: v → v·SEFD/√(npol·Δf·τ) with
  *     SEFD(chan) from Tinst + Tsky + Aeff dimension algebra (C6-C9),
  *     broadcast-joined on chan — the per-subint/per-chan loops of the
  *     reference (`lofar_fluxcal.py:682-780`) become one map-side join
  *  5. spectrum re-binning (A3) + total profile + statistics (A4/A5)
  *
  * One DAG: shuffles only at the scrunch/group keys; all dimension data
  * moves by broadcast; no driver-side loops.
  */
object FluxCal {

  final case class Config(
      dm: Double,
      f0Mhz: Double,
      chanBwMhz: Double,
      nchan: Int,
      nbins: Int,
      tbinSec: Double,
      tsubSec: Double,
      npol: Double = 2.0,
      nstations: Double = 24.0,
      badTileFrac: Double = 0.05,
      t408K: Double = 25.0,
      specRebin: Int = 4)

  final case class Result(calibrated: Cube, report: DataFrame,
                          spectrum: DataFrame, stats: DataFrame,
                          rfi: DataFrame)

  /** Aeff model choice (`fluxcal/lofar_fluxcal.py` --model flag):
    *  - [[ArisN]]: analytic max-theoretical Aeff (`lofar_gain.py:460-473`);
    *  - [[TableGain]]: the S11 gain-cube dimension (GainCube.ingest)
    *    interpolated bilinearly in (freq, el) — `lofar_gain.py:84-128`;
    *  - [[HamakerCarozzi]]: max Aeff divided by the precomputed beam
    *    correction factor looked up at the NEAREST table frequency (J4,
    *    `lofar_gain_hamaker_carozzi.py:104-137`, table shape from
    *    `make_casa_beamcorr.py:45-71`). The Jones-matrix computation
    *    itself stays a precomputed dimension — the same 30× precompute
    *    decision the reference took. */
  sealed trait AeffModel
  case object ArisN extends AeffModel
  /** @param gain dim (freq, el, v) from GainCube.ingest; the grid
    * geometry MUST match the ingest parameters (the HBA defaults here
    * mirror GainCube's) — a mismatched geometry would compute corner
    * indices that miss the grid rows entirely. */
  final case class TableGain(gain: DataFrame, elDeg: Double,
                             flowMhz: Double = 110.0, fstepMhz: Double = 5.0,
                             fhighMhz: Double = 250.0, elMax: Int = 90)
      extends AeffModel
  /** @param beamcorr dim (freq, factor): bc_psr/casa_factor per grid freq */
  final case class HamakerCarozzi(beamcorr: DataFrame) extends AeffModel

  /** Per-channel SEFD dimension: Tsys/Aeff radiometer algebra over the
    * channel grid — a tiny broadcast table built with the same Column
    * pack the oracle queries use. */
  def sefdDim(spark: SparkSession, cfg: Config,
              model: AeffModel = ArisN): DataFrame = {
    val kB = 1380.6485279 // Jy m^2 per K (2k_B/1e-26 scaled into Jy units)
    val base = spark.range(cfg.nchan)
      .select(col("id").cast(IntegerType).as("chan"))
      .withColumn("freq", chanFreq(lit(cfg.f0Mhz), col("chan"), lit(cfg.chanBwMhz)))
      .withColumn("tinst", tinstHba(col("freq")))
      .withColumn("tsky", tskyPortable(lit(cfg.t408K), col("freq")))
      .withColumn("tsys", col("tinst") + col("tsky"))
    // nelem is the TILE count (stations × 24 tiles); aeffMax's HBA branch
    // multiplies by the 16 elements per tile itself (lofar_gain.py:460-467,
    // nelem default = 48 tiles).
    val tiles = cfg.nstations * 24.0
    val withAeff = model match {
      case ArisN =>
        base.withColumn("aeff", aeffMax(lit(true), lit(tiles), col("freq")))
      case TableGain(gain, elDeg, flow, fstep, fhigh, elMax) =>
        graft.operators.GridInterp.bilinear(
          base.withColumn("el", lit(elDeg)), gain, "freq", "el", "aeff",
          flow = flow, fstep = fstep, fhigh = fhigh, elMax = elMax)
          .drop("el")
      case HamakerCarozzi(bc) =>
        // nearest-frequency factor per channel (J4): tiny dims, broadcast
        // cross + argmin — never a shuffle of the samples themselves
        val factor = base.select(col("chan"), col("freq"))
          .crossJoin(broadcast(bc.select(col("freq").as("bc_freq"), col("factor"))))
          .withColumn("dist", abs(col("freq") - col("bc_freq")))
          .groupBy(col("chan"))
          .agg(min(struct(col("dist"), col("bc_freq"), col("factor"))).as("m"))
          .select(col("chan"), col("m.factor").as("factor"))
        base.join(broadcast(factor), Seq("chan"))
          .withColumn("aeff",
            aeffMax(lit(true), lit(tiles), col("freq")) / col("factor"))
          .drop("factor")
    }
    withAeff.withColumn("sefd", lit(2.0) * lit(kB) * col("tsys") /
      ((lit(1.0) - cfg.badTileFrac) * col("aeff")))
  }

  def run(spark: SparkSession, cube: Cube, durations: DataFrame,
          cfg: Config, model: AeffModel = ArisN): Result = {
    val fRef = cfg.f0Mhz + cfg.nchan * cfg.chanBwMhz // top of band
    val normW = ProfileOps.normalizeWeights(cube, durations)
    val rfi = ProfileOps.rfiFraction(normW)
    val dedis = ProfileOps.dedisperse(normW, cfg.dm, cfg.f0Mhz,
      cfg.chanBwMhz, fRef, cfg.tbinSec, cfg.nbins)
    val normed = ProfileOps.qqNormalize(dedis)

    // radiometer scale per channel (broadcast dim), applied map-side
    val dim = sefdDim(spark, cfg, model)
      .withColumn("scale", col("sefd") /
        sqrt(lit(cfg.npol) * (lit(cfg.chanBwMhz) * 1e6) * lit(cfg.tsubSec)))
      .select(col("chan"), col("freq"), col("scale"))
    val calSamples = normed.samples
      .join(broadcast(dim), Seq("chan"))
      .withColumn("value", col("value") * col("scale"))
      .drop("scale")
    val calibrated = Cube(calSamples.drop("freq"), normed.weights)

    // per-(subint, chan) report row: mean calibrated flux + good fraction
    val report = calSamples
      .groupBy(col("obs_id"), col("subint"), col("chan"), col("freq"))
      .agg(avg(col("value")).as("mean_flux"), max(col("value")).as("peak_flux"))
      .join(calibrated.weights, Seq("obs_id", "subint", "chan"))

    val spectrum = ProfileOps.rebinSpectrum(calibrated, cfg.specRebin)
    val total = ProfileOps.totalProfile(calibrated)
    val stats = ProfileOps.profileStats(total, cfg.nbins)
    Result(calibrated, report, spectrum, stats, rfi)
  }
}
