package graft.sources

import java.nio.ByteBuffer
import graft.SparkSpecBase

class PsrfitsSpec extends SparkSpecBase {
  import spark.implicits._

  private val nchan = 4; private val npol = 2; private val nbin = 8
  private val nrows = 2
  private val rowBytes = 8 + 4 * 4 + 8 * 4 + 8 * 4 + npol * nchan * nbin * 2 // 216

  private def card(k: String, v: String): Array[Byte] =
    (f"$k%-8s= $v%20s").padTo(80, ' ').getBytes("US-ASCII")
  private def strCard(k: String, v: String): Array[Byte] =
    (f"$k%-8s= ${s"'$v'"}%-20s").padTo(80, ' ').getBytes("US-ASCII")
  private def headerBlock(cards: Seq[Array[Byte]]): Array[Byte] = {
    val body = cards.flatten.toArray ++ "END".padTo(80, ' ').getBytes("US-ASCII")
    body ++ Array.fill[Byte](((body.length + 2879) / 2880) * 2880 - body.length)(' ')
  }

  /** Synthesize a minimal PSRFITS archive: primary header + SUBINT
    * BINTABLE with 2 subints × 2 pol × 4 chan × 8 bins of int16 data. */
  private def synthArchive(): Array[Byte] = {
    val primary = headerBlock(Seq(
      card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
      strCard("OBS_ID", "L12345")))
    val subHdr = headerBlock(Seq(
      strCard("XTENSION", "BINTABLE"), card("BITPIX", "8"), card("NAXIS", "2"),
      card("NAXIS1", rowBytes.toString), card("NAXIS2", nrows.toString),
      card("PCOUNT", "0"), card("GCOUNT", "1"), card("TFIELDS", "5"),
      strCard("TTYPE1", "TSUBINT"), strCard("TFORM1", "1D"),
      strCard("TTYPE2", "DAT_WTS"), strCard("TFORM2", s"${nchan}E"),
      strCard("TTYPE3", "DAT_SCL"), strCard("TFORM3", s"${npol * nchan}E"),
      strCard("TTYPE4", "DAT_OFFS"), strCard("TFORM4", s"${npol * nchan}E"),
      strCard("TTYPE5", "DATA"), strCard("TFORM5", s"${npol * nchan * nbin}I"),
      card("NCHAN", nchan.toString), card("NPOL", npol.toString),
      card("NBIN", nbin.toString), strCard("EXTNAME", "SUBINT")))
    val data = ByteBuffer.allocate(nrows * rowBytes) // big-endian default
    for (r <- 0 until nrows) {
      data.putDouble(10.0 + r)
      for (ch <- 0 until nchan)
        data.putFloat(if (r == 0 && ch == 1) 0.0f else 1.0f) // zap (0, 1)
      for (pc <- 0 until npol * nchan) data.putFloat(1.0f + pc * 0.5f)
      for (pc <- 0 until npol * nchan) data.putFloat(pc * 2.0f)
      for (flat <- 0 until npol * nchan * nbin) data.putShort(flat.toShort)
    }
    val payload = data.array()
    val padded = payload ++
      Array.fill[Byte](((payload.length + 2879) / 2880) * 2880 - payload.length)(0)
    primary ++ subHdr ++ padded
  }

  test("header walk finds the SUBINT BINTABLE and its layout") {
    val bytes = synthArchive()
    val all = Psrfits.hdus(bytes)
    assert(all.head.cards("OBS_ID") == "L12345")
    val sub = all.find(_.cards.get("EXTNAME").contains("SUBINT")).get
    assert(sub.cards("NAXIS1").toInt == rowBytes)
    val cols = Psrfits.columns(sub.cards)
    assert(cols("DATA").repeat == npol * nchan * nbin)
    assert(cols("DATA").code == 'I')
    assert(cols("DAT_WTS").offset == 8)
  }

  test("subintCube decodes scale/offset data and splits weights") {
    val dir = java.nio.file.Files.createTempDirectory("psrfits")
    java.nio.file.Files.write(dir.resolve("a.fits"), synthArchive())
    val cube = Psrfits.subintCube(spark, dir.resolve("a.fits").toString)
    assert(cube.samples.count() == nrows.toLong * npol * nchan * nbin)
    // subint 1, pol 1, chan 2, bin 3: pc = 6, flat = 51, raw = 51
    // value = 51 * (1 + 6*0.5) + 6*2 = 216
    val v = cube.samples.filter(
      $"subint" === 1 && $"pol" === 1 && $"chan" === 2 && $"bin" === 3)
      .select($"value").as[Double].head()
    assert(v == 216.0)
    assert(cube.samples.filter($"obs_id" =!= "L12345").count() == 0)
    // weights: one row per (subint, chan); (0, 1) is zapped
    assert(cube.weights.count() == nrows.toLong * nchan)
    val w01 = cube.weights.filter($"subint" === 0 && $"chan" === 1)
      .select($"weight").as[Double].head()
    assert(w01 == 0.0)
  }

  test("decoded cube flows into ProfileOps (zap-aware total profile)") {
    val dir = java.nio.file.Files.createTempDirectory("psrfits2")
    java.nio.file.Files.write(dir.resolve("b.fits"), synthArchive())
    val cube = Psrfits.subintCube(spark, dir.resolve("b.fits").toString)
    val total = graft.operators.ProfileOps.totalProfile(cube)
    assert(total.count() > 0)
  }
}
