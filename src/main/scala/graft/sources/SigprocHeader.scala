package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6: sigproc filterbank/tim header codec (`pulsestack.py:292-301` uses
  * `sigproc.read_header` to pull tstart/tsamp/source_name before reading
  * the float32 time series that follows).
  *
  * The on-disk format (public SIGPROC convention) is a token stream:
  * `int32-LE length + ASCII name`, each known name followed by its typed
  * value — little-endian double, int32, or a length-prefixed string —
  * bracketed by HEADER_START/HEADER_END. The decoder returns both the
  * header map and the header's byte size so the sample decoder knows
  * where the payload begins.
  */
object SigprocHeader {

  private val DoubleKeys = Set("tsamp", "tstart", "fch1", "foff", "refdm",
    "az_start", "za_start", "src_raj", "src_dej", "period", "fchannel")
  private val IntKeys = Set("nchans", "nbits", "nifs", "telescope_id",
    "machine_id", "data_type", "barycentric", "pulsarcentric", "nbeams",
    "ibeam", "nsamples", "nbins")
  private val LongKeys = Set("npuls")
  private val ByteKeys = Set("signed")
  private val StringKeys = Set("source_name", "rawdatafile")

  final case class Header(values: Map[String, Any], sizeBytes: Int) {
    def double(k: String): Double = values(k).asInstanceOf[Double]
    def int(k: String): Int = values(k).asInstanceOf[Int]
    def string(k: String): String = values(k).asInstanceOf[String]
  }

  /** Decode the header at the start of `bytes`. Throws on malformed or
    * missing HEADER_START (mirrors the reference's hard failure). */
  def decode(bytes: Array[Byte]): Header = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def token(): String = {
      val n = buf.getInt()
      require(n > 0 && n < 128, s"bad sigproc token length $n")
      val b = new Array[Byte](n); buf.get(b); new String(b, "US-ASCII")
    }
    require(token() == "HEADER_START", "not a sigproc header")
    var values = Map.empty[String, Any]
    var done = false
    while (!done) {
      val key = token()
      if (key == "HEADER_END") done = true
      else if (DoubleKeys(key)) values += key -> buf.getDouble()
      else if (IntKeys(key)) values += key -> buf.getInt()
      else if (LongKeys(key)) values += key -> buf.getLong()
      else if (ByteKeys(key)) values += key -> buf.get()
      else if (StringKeys(key)) values += key -> token()
      else throw new IllegalArgumentException(s"unknown sigproc key '$key'")
    }
    Header(values, buf.position())
  }

  /** Encode a header (spec round-trips and fixture synthesis). */
  def encode(values: Seq[(String, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def putInt(i: Int): Unit = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i)
      out.write(b.array())
    }
    def putToken(s: String): Unit = { putInt(s.length); out.write(s.getBytes("US-ASCII")) }
    putToken("HEADER_START")
    values.foreach { case (k, v) =>
      putToken(k)
      v match {
        case d: Double => out.write(
          ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array())
        case l: Long => out.write(
          ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array())
        case i: Int => putInt(i)
        case b: Byte => out.write(b.toInt)
        case s: String => putToken(s)
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
    }
    putToken("HEADER_END")
    out.toByteArray
  }

  /** Tim-file scan: one header-bearing float32 time series per file →
    * (path, idx, value) with the per-file header fields carried along —
    * the distributed form of `pulsestack.py:292-301` + the block read
    * loop. Header decode happens inside the same file task as sample
    * decode; nothing is collected. */
  def timFileStream(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val hdr = decode(bytes)
        val tstart = hdr.double("tstart")
        val tsamp = hdr.double("tsamp")
        val source = hdr.values.get("source_name").map(_.toString).getOrElse("")
        val buf = ByteBuffer.wrap(bytes, hdr.sizeBytes, bytes.length - hdr.sizeBytes)
          .order(ByteOrder.LITTLE_ENDIAN)
        val n = (bytes.length - hdr.sizeBytes) / 4
        Iterator.tabulate(n) { i =>
          (path, i.toLong, buf.getFloat(hdr.sizeBytes + i * 4), tstart, tsamp, source)
        }
      }
      .toDF("path", "idx", "value", "tstart_mjd", "tsamp_sec", "source")
  }
}
