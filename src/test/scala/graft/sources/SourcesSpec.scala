package graft.sources

import java.nio.file.{Files, Path}
import java.nio.{ByteBuffer, ByteOrder}
import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir: Path = {
    val d = Files.createTempDirectory("graft-src")
    d.toFile.deleteOnExit(); d
  }

  test("float32Stream round-trips a little-endian .dat file in order") {
    val dir = tmpDir
    val vals = Array.tabulate(1000)(i => (math.sin(i * 0.1) * 100).toFloat)
    val buf = ByteBuffer.allocate(vals.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(buf.putFloat)
    Files.write(dir.resolve("beam0.dat"), buf.array())
    val got = BinarySources.float32Stream(spark, dir.toString + "/*.dat")
      .orderBy($"idx").select($"value").as[Float].collect()
    assert(got.toSeq == vals.toSeq)
  }

  test("int16Subbands decodes per-file and extracts the subband id") {
    val dir = tmpDir
    for (sb <- Seq(3, 17)) {
      val vals = Array.tabulate(100)(i => (i * sb).toShort)
      val buf = ByteBuffer.allocate(vals.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(buf.putShort)
      Files.write(dir.resolve(f"obs_SB$sb%03d.raw"), buf.array())
    }
    val df = BinarySources.int16Subbands(spark, dir.toString + "/*.raw")
    val bySb = df.groupBy($"subband").agg(count(lit(1)), max($"value"))
      .as[(Int, Long, Short)].collect().sortBy(_._1)
    assert(bySb.toSeq == Seq((3, 100L, (99 * 3).toShort), (17, 100L, (99 * 17).toShort)))
  }

  test("applyScaleOffset maps raw counts through per-key calibration") {
    val raw = Seq((0, 10.0), (1, 10.0)).toDF("blk", "value")
    val cal = Seq((0, 2.0, 1.0), (1, 0.5, -1.0)).toDF("blk", "scale", "offset")
    val got = BinarySources.applyScaleOffset(raw, cal, Seq("blk"))
      .orderBy($"blk").select($"value").as[Double].collect()
    assert(got.toSeq == Seq(21.0, 4.0))
  }

  test("infSidecar extracts keyed metadata into one row") {
    val dir = tmpDir
    Files.write(dir.resolve("obs.inf"),
      """ Data file name without suffix          =  B0329+54_L12345
        | Width of each time series bin (sec)    =  0.00131072
        | Epoch of observation (MJD)             =  56000.123456789
        |""".stripMargin.getBytes)
    val df = BinarySources.infSidecar(spark, dir.resolve("obs.inf").toString,
      Map("Width of each time series" -> "tsamp",
        "Epoch of observation" -> "epoch_mjd",
        "Data file name" -> "stem"))
    val r = df.select($"tsamp", $"epoch_mjd", $"stem").as[(String, String, String)].head()
    assert(r == ("0.00131072", "56000.123456789", "B0329+54_L12345"))
  }

  test("whitespaceTable parses .singlepulse rows and drops comments") {
    val dir = tmpDir
    Files.write(dir.resolve("cand.singlepulse"),
      """# DM      Sigma      Time (s)     Sample    Downfact
        |26.76    5.30     101.864000    77722      30
        |26.76    8.02     100.224000    76471       3
        |""".stripMargin.getBytes)
    val schema = StructType(Seq(
      StructField("dm", DoubleType), StructField("sigma", DoubleType),
      StructField("secs", DoubleType), StructField("sample", LongType),
      StructField("downfact", IntegerType)))
    val got = BinarySources.whitespaceTable(spark,
        dir.resolve("cand.singlepulse").toString, schema)
      .orderBy($"sample").as[(Double, Double, Double, Long, Int)].collect()
    assert(got.toSeq == Seq((26.76, 8.02, 100.224, 76471L, 3),
      (26.76, 5.3, 101.864, 77722L, 30)))
  }

  test("fixedWidth splits 5-char strides like the Haslam table") {
    val df = Seq("  123 4567  890").toDF("s")
    val got = BinarySources.fixedWidth(df, "s", Seq(
        ("a", 5, IntegerType), ("b", 5, IntegerType), ("c", 5, IntegerType)))
      .as[(Int, Int, Int)].head()
    assert(got == ((123, 4567, 890)))
  }

  test("keyValueLog parses chisq diagnostic lines") {
    val dir = tmpDir
    Files.write(dir.resolve("chisq.log"),
      """CS002HBA0 chisq=1.23
        |# comment
        |RS407HBA chisq=9.87
        |""".stripMargin.getBytes)
    val got = BinarySources.keyValueLog(spark, dir.resolve("chisq.log").toString)
      .orderBy($"station").as[(String, String, String)].collect()
    assert(got.toSeq == Seq(("CS002HBA0", "chisq", "1.23"),
      ("RS407HBA", "chisq", "9.87")))
  }

  test("csv sink + source round trip with quoting") {
    val dir = tmpDir.resolve("out").toString
    val df = Seq((1L, "a,b", 2.5), (2L, "plain", -1.0)).toDF("id", "s", "x")
    Sinks.csv(df, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("x", DoubleType)))
    val back = BinarySources.csvTable(spark, dir, schema, header = true)
      .orderBy($"id").as[(Long, String, Double)].collect()
    assert(back.toSeq == Seq((1L, "a,b", 2.5), (2L, "plain", -1.0)))
  }

  test("fixedWidthReport renders right-aligned columns") {
    val dir = tmpDir.resolve("rep").toString
    Sinks.fixedWidthReport(Seq((7, 3.5), (42, -1.25)).toDF("a", "b"),
      Seq(("a", 6), ("b", 10)), dir)
    val lines = spark.read.textFile(dir).collect().sorted
    assert(lines.contains("     7       3.5"))
    assert(lines.contains("    42     -1.25"))
  }

  test("deadLetter appends across writes") {
    val dir = tmpDir.resolve("dlq").toString
    Sinks.deadLetter(Seq(("u1", "failed")).toDF("url", "why"), dir)
    Sinks.deadLetter(Seq(("u2", "timeout")).toDF("url", "why"), dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("cubeParquet partitions by obs_id for partition-pruned re-reads") {
    val dir = tmpDir.resolve("cube").toString
    val df = Seq(("L1", 0, 1.0), ("L2", 1, 2.0)).toDF("obs_id", "bin", "value")
    Sinks.cubeParquet(df, dir)
    assert(new java.io.File(dir, "obs_id=L1").exists())
    val pruned = spark.read.parquet(dir).filter($"obs_id" === "L2")
    assert(pruned.count() == 1)
  }

  test("beamcorr ingest: whitespace table to per-station dimension slice") {
    val dir = tmpDir
    val f = dir.resolve("beamcorr.txt")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      "# station freq factor",
      "CS002 110.05 1.23",
      "CS002 115.91 1.31",
      "DE601 110.05 2.05"))
    val dim = BeamCorr.ingest(spark, f.toString)
    assert(dim.count() == 3)
    val cs = BeamCorr.forStation(dim, "CS002")
      .orderBy($"freq").as[(Double, Double)].collect()
    assert(cs.toSeq == Seq((110.05, 1.23), (115.91, 1.31)))
  }

  test("sigproc header: encode/decode round-trip preserves fields and size") {
    val fields = Seq[(String, Any)](
      "source_name" -> "B0329+54", "telescope_id" -> 1, "machine_id" -> 10,
      "data_type" -> 2, "tstart" -> 56000.123456789, "tsamp" -> 8.192e-5,
      "nchans" -> 1, "nbits" -> 32, "refdm" -> 26.833)
    val bytes = SigprocHeader.encode(fields)
    val hdr = SigprocHeader.decode(bytes ++ Array.fill[Byte](16)(0)) // payload after
    assert(hdr.sizeBytes == bytes.length)
    assert(hdr.string("source_name") == "B0329+54")
    assert(hdr.double("tstart") == 56000.123456789)
    assert(hdr.double("tsamp") == 8.192e-5)
    assert(hdr.int("nbits") == 32)
    assert(hdr.double("refdm") == 26.833)
  }

  test("timFileStream decodes header + float32 payload per file") {
    val dir = tmpDir
    val hdr = SigprocHeader.encode(Seq[(String, Any)](
      "source_name" -> "J0218+4232", "tstart" -> 55000.5, "tsamp" -> 0.001,
      "nbits" -> 32))
    val payload = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    payload.putFloat(1.5f).putFloat(-2.5f).putFloat(3.25f)
    java.nio.file.Files.write(dir.resolve("a.tim"), hdr ++ payload.array())
    val rows = SigprocHeader.timFileStream(spark, dir.resolve("a.tim").toString)
      .orderBy($"idx")
      .select($"idx", $"value", $"tstart_mjd", $"tsamp_sec", $"source")
      .as[(Long, Float, Double, Double, String)].collect()
    assert(rows.map(_._2).toSeq == Seq(1.5f, -2.5f, 3.25f))
    assert(rows.forall(r => r._3 == 55000.5 && r._4 == 0.001 && r._5 == "J0218+4232"))
  }

  test("binaryProfile writes bin-ordered packed float32") {
    val dir = tmpDir.resolve("prof.bin").toString
    val df = Seq((2, 3.0), (0, 1.0), (1, 2.0)).toDF("bin", "v")
    Sinks.binaryProfile(df, "bin", "v", dir)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val got = Array.fill(3)(buf.getFloat)
    assert(got.toSeq == Seq(1.0f, 2.0f, 3.0f))
  }
}
