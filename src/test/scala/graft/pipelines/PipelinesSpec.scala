package graft.pipelines

import java.nio.file.Files
import java.nio.{ByteBuffer, ByteOrder}
import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSpecBase {
  import spark.implicits._

  test("PulseStack: raw .dat with drifting baseline + periodic pulse folds cleanly") {
    val dir = Files.createTempDirectory("graft-ps")
    val tsamp = 0.001; val period = 0.25; val n = 100000
    val rng = new scala.util.Random(5)
    val vals = Array.tabulate(n) { i =>
      val t = i * tsamp
      val baseline = 50.0 + 0.008 * i % 900        // strong slow drift
      val phase = (t / period) % 1.0
      val pulse = if (phase > 0.4 && phase < 0.44) 30.0 else 0.0
      (baseline + pulse + rng.nextGaussian()).toFloat
    }
    val buf = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(buf.putFloat)
    Files.write(dir.resolve("obs.dat"), buf.array())

    val prof = PulseStack.run(spark, dir.toString + "/*.dat",
      PulseStack.Config(tsampSec = tsamp, t0Sec = 0.0, periodSec = period, nbins = 50))
      .select($"ibin", $"profile").as[(Int, Double)].collect()
    assert(prof.length == 50)
    val peak = prof.maxBy(_._2)._1
    assert(peak >= 20 && peak <= 22, s"folded peak at bin $peak, expected ~phase 0.42")
  }

  test("PulseStack: a multi-file glob folds each file separately") {
    val dir = Files.createTempDirectory("graft-ps2")
    val tsamp = 0.001; val period = 0.2; val n = 20000
    def write(name: String, phaseCenter: Double): Unit = {
      val vals = Array.tabulate(n) { i =>
        val phase = (i * tsamp / period) % 1.0
        (if (math.abs(phase - phaseCenter) < 0.03) 50.0 else 0.0).toFloat
      }
      val buf = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(buf.putFloat)
      Files.write(dir.resolve(name), buf.array())
    }
    write("a.dat", 0.25) // pulse at phase 0.25
    write("b.dat", 0.75) // pulse at phase 0.75
    val prof = PulseStack.run(spark, dir.toString + "/*.dat",
      PulseStack.Config(tsampSec = tsamp, t0Sec = 0.0, periodSec = period,
        nbins = 20, detrendChunk = 20000)) // single chunk: keep the pulse
      .select($"path", $"ibin", $"profile").as[(String, Int, Double)].collect()
    val peaks = prof.groupBy(_._1).map { case (p, rows) =>
      p.split('/').last -> rows.maxBy(_._3)._2
    }
    // each file's profile peaks at ITS OWN phase — pooling would smear both
    assert(peaks("a.dat") == 5, s"got $peaks")
    assert(peaks("b.dat") == 15, s"got $peaks")
  }

  test("SubDyn: clean vs RFI-loaded subbands separate in the report") {
    val dir = Files.createTempDirectory("graft-sd")
    val rng = new scala.util.Random(6)
    def write(sb: Int, rfi: Boolean): Unit = {
      val vals = Array.tabulate(40000) { i =>
        val base = rng.nextGaussian() * 10
        // RFI: a few windows carry strong bursts — genuine outliers the
        // per-band (mean, std) normalization cannot absorb
        val burst = if (rfi && (i / 1000) % 13 == 5 && i % 4 == 0) 2000.0 else 0.0
        (base + burst).toShort
      }
      val buf = ByteBuffer.allocate(vals.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(buf.putShort)
      Files.write(dir.resolve(f"obs_SB$sb%03d.raw"), buf.array())
    }
    write(1, rfi = false); write(2, rfi = true)
    val res = SubDyn.run(spark, dir.toString + "/*.raw",
      SubDyn.Config(avgWindow = 1000, clipSigma = 3.0, excludeLimit = 0.4))
    val report = res.rfiReport.select($"subband", $"rfi_frac")
      .as[(Int, Double)].collect().toMap
    assert(report(2) > report(1), s"RFI band not flagged: $report")
    assert(res.rfiReport.count() == 2)
    // windowed averaging produced the expected dynamic-spectrum shape
    assert(res.dynspec.filter($"subband" === 1).count() == 40)
  }

  test("Sp2Tim: candidates filter and render to parseable tim lines") {
    val dir = Files.createTempDirectory("graft-tim")
    Files.write(dir.resolve("c.singlepulse"),
      """# DM Sigma Time Sample Downfact
        |26.8   9.5   10.50   10500   3
        |26.8   4.0   11.00   11000   3
        |99.0   8.0   12.00   12000   5
        |""".stripMargin.getBytes)
    val out = dir.resolve("out.tim").toString
    val lines = Sp2Tim.run(spark, dir.resolve("c.singlepulse").toString, out,
      Sp2Tim.Config(startMjd = 56000.0, tresSec = 0.001, psrName = "B0329+54",
        minSigma = 6.0, dmRange = Some((20.0, 30.0))))
      .select($"tim_line").as[String].collect()
    assert(lines.length == 1, s"filters failed: ${lines.toSeq}")
    assert(lines.head.startsWith("B0329+54"))
    assert(lines.head.contains("56000.")) // TOA near startMjd + 10.5 s
    val written = spark.read.textFile(out).collect()
    assert(written.toSeq == lines.toSeq)
  }
}
