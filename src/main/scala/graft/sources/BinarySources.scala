package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-stream and text-table sources (SURVEY.md §2.1).
  *
  * The reference reads raw telescope streams with manual seek+block loops
  * (`pulsestack.py:446-465`, `subdyn.py:345-421`); here a `binaryFile`
  * scan plus a per-file chunk decoder produces the same long-format rows
  * with Spark handling listing, distribution, and locality. One file maps
  * to one partition-task — the natural unit since sample index is
  * file-relative; at 100 TB the fleet of `.dat`/subband files (one per
  * beam/subband) parallelizes across executors by file, and downstream
  * repartitioning is by (file, block) key.
  */
object BinarySources {

  /** S3: float32 little-endian `.dat` stream → (path, idx, value).
    * Decoding streams through the byte payload without boxing per value
    * into an intermediate collection larger than one file block. */
  def float32Stream(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / 4
        Iterator.tabulate(n)(i => (path, i.toLong, buf.getFloat(i * 4)))
      }
      .toDF("path", "idx", "value")
  }

  /** S4: int16 subband files (one per subband) → (subband, idx, value);
    * subband id parsed from the filename (`subdyn.py:345-421`). */
  def int16Subbands(spark: SparkSession, glob: String,
                    subbandPattern: String = ".*_SB(\\d+)[^/]*$"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / 2
        Iterator.tabulate(n)(i => (path, i.toLong, buf.getShort(i * 2)))
      }
      .toDF("path", "idx", "value")
      .withColumn("subband",
        regexp_extract(col("path"), subbandPattern, 1).cast(IntegerType))
  }

  /** S5: PSRFITS-style scale/offset application — raw·scale + offset with
    * per-(file, block) calibration rows joined in (`subdyn.py:474-556`). */
  def applyScaleOffset(raw: DataFrame, scales: DataFrame,
                       keys: Seq[String]): DataFrame =
    raw.join(broadcast(scales), keys)
      .withColumn("value",
        col("value").cast(DoubleType) * col("scale") + col("offset"))
      .drop("scale", "offset")

  /** S7: `.inf` sidecar (` key = value` lines) → one-row DataFrame with
    * string columns named by cleaned keys (`pulsestack.py:316-325`). */
  def infSidecar(spark: SparkSession, path: String,
                 keyMap: Map[String, String]): DataFrame = {
    val kv = spark.read.textFile(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        trim(regexp_extract(col("value"), "^([^=]+)=", 1)).as("k"),
        trim(regexp_extract(col("value"), "=(.*)$", 1)).as("v"))
    val rows = kv.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val cols = keyMap.toSeq.map { case (pattern, name) =>
      val v = rows.collectFirst { case (k, value) if k.contains(pattern) => value }
      lit(v.orNull).as(name)
    }
    spark.range(1).select(cols: _*)
  }

  /** S9: whitespace-delimited table (`.singlepulse`, targets lists) with
    * `#` comments dropped (`sp2tim.py:121-126`). */
  def whitespaceTable(spark: SparkSession, path: String,
                      schema: StructType): DataFrame = {
    val lines = spark.read.textFile(path)
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
    val parts = split(trim(col("value")), "\\s+")
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      element_at(parts, i + 1).cast(f.dataType).as(f.name)
    }
    lines.select(cols.toIndexedSeq: _*)
  }

  /** S9: `key=value` diagnostic log lines → (station, key, value) rows
    * (`FE-map/lofar_status_map.py:124-136`). */
  def keyValueLog(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path)
      .filter(!col("value").startsWith("#") && col("value").contains("="))
      .select(
        regexp_extract(col("value"), "^(\\S+)", 1).as("station"),
        regexp_extract(col("value"), "(\\w+)=", 1).as("key"),
        regexp_extract(col("value"), "=(\\S+)", 1).as("val"))

  /** S10: generic fixed-width splitter: one string column → typed columns
    * at the given (start offsets are cumulative) widths
    * (`fluxcal/tsky.py:1044-1049`). */
  def fixedWidth(df: DataFrame, src: String,
                 fields: Seq[(String, Int, DataType)]): DataFrame = {
    var pos = 1
    val cols = fields.map { case (name, width, dt) =>
      val c = trim(substring(col(src), pos, width)).cast(dt).as(name)
      pos += width
      c
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** S8: CSV scan with explicit schema, quote stripping and projection —
    * the `lta-retrieve` CSV reader (`LTA/lta-retrieve.py:377-405`). */
  def csvTable(spark: SparkSession, path: String, schema: StructType,
               header: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("quote", "\"")
      .option("comment", "#")
      .csv(path)
}
