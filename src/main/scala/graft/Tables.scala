package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness tables (TESTDATA.md). Explicit helpers keep
  * column pruning/pushdown visible at call sites; the `events` loader
  * normalizes the nanosecond timestamp column.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events with `ts` normalized: raw column is INT64 TIMESTAMP(NANOS)
    * (read as Long under spark.sql.legacy.parquet.nanosAsLong); expose both
    * the exact ns count (`ts_ns`) and an epoch-seconds Long (`ts_sec`) so
    * downstream queries are precision-stable against non-Spark engines.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_sec", floor(col("ts_ns") / 1000000000L).cast("long"))
      case _ => // native timestamp (micros) — derive the same two columns
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
          .withColumn("ts_sec", floor(unix_micros(col("ts")) / 1000000L).cast("long"))
          .drop("ts")
    }
  }
}
