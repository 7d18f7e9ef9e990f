package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{BinarySources, Sinks}

/** `sp2tim.py` analog: `.singlepulse` candidates → DM/sigma filters →
  * TOA = start MJD + offset·tres/86400 (F11) → fixed-format tim lines
  * rendered distributively (K3/C13) → text sink.
  */
object Sp2Tim {

  val singlePulseSchema: StructType = StructType(Seq(
    StructField("dm", DoubleType), StructField("sigma", DoubleType),
    StructField("secs", DoubleType), StructField("sample", LongType),
    StructField("downfact", IntegerType)))

  final case class Config(
      startMjd: Double,
      tresSec: Double,
      psrName: String,
      freqMhz: Double = 151.0,
      minSigma: Double = 6.0,
      dmRange: Option[(Double, Double)] = None)

  /** Candidates → tim-line DataFrame (one string row per TOA). */
  def timLines(cands: DataFrame, cfg: Config): DataFrame = {
    val filtered = cfg.dmRange.foldLeft(cands.filter(col("sigma") >= cfg.minSigma)) {
      case (df, (lo, hi)) => df.filter(col("dm") >= lo && col("dm") <= hi)
    }
    // TOA rendered from integer micro-day pieces — engine-independent text
    val toaDays = col("sample").cast(DoubleType) * (cfg.tresSec / 86400.0)
    val mjdInt = floor(lit(cfg.startMjd) + toaDays).cast(LongType)
    val fracE13 = floor(((lit(cfg.startMjd) + toaDays) - floor(lit(cfg.startMjd) + toaDays)) * 1e13).cast(LongType)
    filtered
      .withColumn("toa_str", concat(mjdInt.cast(StringType), lit("."),
        lpad(fracE13.cast(StringType), 13, "0")))
      .withColumn("tim_line", concat(
        rpad(lit(cfg.psrName), 12, " "),
        format_string("%9.3f", lit(cfg.freqMhz)), lit(" "),
        col("toa_str"), lit(" "),
        lpad(round(lit(1e6) * lit(cfg.tresSec) / col("sigma"), 2).cast(StringType), 8, " "),
        lit("  1")))
      .select(col("dm"), col("sigma"), col("sample"), col("toa_str"), col("tim_line"))
  }

  def run(spark: SparkSession, singlePulsePath: String, outPath: String,
          cfg: Config): DataFrame = {
    val cands = BinarySources.whitespaceTable(spark, singlePulsePath, singlePulseSchema)
    val lines = timLines(cands, cfg)
    Sinks.timLines(lines, "tim_line", outPath)
    lines
  }
}
