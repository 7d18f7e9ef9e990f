package graft.sources

import graft.SparkSpecBase

class GainCubeSpec extends SparkSpecBase {
  import spark.implicits._

  test("ingest recovers az-means and un-normalizes by T(f)") {
    // 2 freqs × 3 az × 2 el, el fastest (the loadtxt linear order,
    // `lofar_gain.py:166-171`): values chosen so the az-means are exact
    val values = Seq(
      1.0, 2.0, 3.0, 4.0, 5.0, 6.0, // freq0: az-mean el0 = 3, el1 = 4
      10.0, 10.0, 10.0, 10.0, 10.0, 10.0) // freq1: all 10
    val dir = java.nio.file.Files.createTempDirectory("gaincube").toFile
    val f = new java.io.File(dir, "cube.txt")
    // write a few values per line — loadtxt accepts any whitespace layout
    val w = new java.io.PrintWriter(f)
    values.grouped(4).foreach(g => w.println(g.mkString(" ")))
    w.close()

    val dim = GainCube.ingest(spark, f.getAbsolutePath,
      flowMhz = 110.0, fstepMhz = 5.0, nFreq = 2, nAz = 3, nEl = 2)
      .as[(Double, Double, Double)].collect()
      .map { case (fr, el, v) => (fr, el) -> v }.toMap

    val t110 = GainCube.tableT(110.0)
    val t115 = GainCube.tableT(115.0)
    assert(math.abs(dim((110.0, 0.0)) - 3.0 * t110) < 1e-9)
    assert(math.abs(dim((110.0, 1.0)) - 4.0 * t110) < 1e-9)
    assert(math.abs(dim((115.0, 0.0)) - 10.0 * t115) < 1e-9)
    assert(math.abs(dim((115.0, 1.0)) - 10.0 * t115) < 1e-9)
    assert(dim.size === 4)
  }

  test("table T matches the simulation's normalization model at band center") {
    // T(f) = 400 + (λ/0.2008)^2.55 + (f/1e9)^1.8 + 2.7, λ = c/f
    val f = 150.0
    val lambda = 3.0e8 / (f * 1e6)
    val expected = 400.0 + math.pow(lambda / 0.2008, 2.55) +
      math.pow(f * 1e6 / 1e9, 1.8) + 2.7
    assert(math.abs(GainCube.tableT(f) - expected) < 1e-12)
  }
}
