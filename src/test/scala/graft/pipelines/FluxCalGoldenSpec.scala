package graft.pipelines

import graft.SparkSpecBase
import graft.operators.CubeFixture
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship calibration pipeline at a LARGER grain than the
  * fixture-sized FluxCalSpec: 32 subints × 64 channels × 256 bins
  * (~524k samples — a multi-partition run, so distributed aggregation
  * order and the weight/dedisperse/Q-Q chain are exercised across
  * shuffles, not inside one task). The report (one row per (subint,
  * chan), 2048 rows) is compared against a committed golden.
  *
  * Tolerance discipline: keys and row count compare EXACTLY; float
  * columns compare within relative 1e-9 — the pipeline's means/maxima
  * are distributed reductions whose IEEE add order may legally differ
  * across partitionings, and 1e-9 is ~7 orders looser than double ulp
  * while ~6 orders tighter than any physical claim the report makes.
  */
object FluxCalGolden {
  val GoldenPath = "src/test/resources/golden/fluxcal_large"

  val spec: CubeFixture.Spec = CubeFixture.Spec(
    nsubint = 32, nchan = 64, nbin = 256,
    dm = 30.0, pulseAmp = 30.0, chanBwMhz = 2.0,
    zapped = Seq((0, 3), (5, 7), (12, 40), (25, 63)), seed = 7L)

  val cfg: FluxCal.Config = FluxCal.Config(
    dm = spec.dm, f0Mhz = spec.f0Mhz, chanBwMhz = spec.chanBwMhz,
    nchan = spec.nchan, nbins = spec.nbin, tbinSec = spec.tbinSec,
    tsubSec = 10.0)

  def build(spark: SparkSession): DataFrame =
    FluxCal.run(spark, CubeFixture.build(spark, spec),
      CubeFixture.durations(spark, spec), cfg).report
}

/** Regenerates the committed golden parquet. Run after an INTENDED
  * numeric change, then review the diff:
  *   sbt "Test/runMain graft.pipelines.MakeFluxCalGolden"
  */
object MakeFluxCalGolden {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    FluxCalGolden.build(spark)
      .orderBy(col("subint"), col("chan")).coalesce(1)
      .write.mode("overwrite").parquet(FluxCalGolden.GoldenPath)
    spark.stop()
  }
}

class FluxCalGoldenSpec extends SparkSpecBase {

  test("large-grain fluxcal report matches the committed golden within 1e-9") {
    val got = FluxCalGolden.build(spark)
    val golden = spark.read.parquet(FluxCalGolden.GoldenPath)
    assert(got.columns.sorted.sameElements(golden.columns.sorted),
      s"schema drift: ${got.columns.mkString(",")} vs ${golden.columns.mkString(",")}")
    val keyCols = Seq("obs_id", "subint", "chan")
    val numCols = got.columns.filterNot(keyCols.contains).sorted
    def grab(df: DataFrame): Array[(String, Array[Double])] =
      df.select((keyCols ++ numCols).map(col): _*).collect().map { r =>
        val key = keyCols.indices.map(r.get(_).toString).mkString("|")
        val nums = numCols.indices.map(i =>
          r.get(keyCols.length + i).toString.toDouble).toArray
        key -> nums
      }.sortBy(_._1)
    val g = grab(got)
    val w = grab(golden)
    assert(g.length == w.length && g.length == 32 * 64,
      s"row count ${g.length} vs golden ${w.length}")
    assert(g.map(_._1).sameElements(w.map(_._1)), "key set drifted from golden")
    val worst = g.zip(w).flatMap { case ((k, gs), (_, ws)) =>
      gs.zip(ws).zipWithIndex.map { case ((a, b), i) =>
        val denom = math.max(math.abs(b), 1e-300)
        (math.abs(a - b) / denom, s"$k/${numCols(i)}: $a vs $b")
      }
    }.maxBy(_._1)
    assert(worst._1 <= 1e-9,
      s"relative error ${worst._1} exceeds 1e-9 at ${worst._2}")
  }
}
