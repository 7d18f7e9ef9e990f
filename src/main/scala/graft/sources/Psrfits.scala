package graft.sources

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Cube

/** S1: PSRFITS archive ingest — the subset of FITS the reference's cube
  * loads actually touch (`subdyn.py:474-556` reads the SUBINT BINTABLE's
  * header keys, per-row DATA with DAT_SCL/DAT_OFFS applied, and DAT_WTS;
  * `fluxcal/lofar_fluxcal.py:377-382` consumes the same cube through
  * psrchive).
  *
  * FITS is a public format: 2880-byte header blocks of 80-char cards,
  * then big-endian data payloads padded to the block size. This reader
  * parses the card stream, walks the HDUs, locates the SUBINT binary
  * table, and decodes each subintegration row into long-format cube
  * samples with the scale/offset applied (S5) and the per-(subint, chan)
  * weights split out — exactly the `Cube` model every downstream
  * operator consumes.
  *
  * Distribution: one archive file = one `binaryFile` task (same contract
  * as S3/S4); a fleet of archives parallelizes by file and the resulting
  * cube partitions by (obs_id, subint) downstream.
  */
object Psrfits {

  private val Block = 2880

  final case class Hdu(cards: Map[String, String], dataStart: Int, dataLen: Int)
  final case class Col(name: String, repeat: Int, code: Char, offset: Int)

  /** One header: consume 2880-byte blocks of 36×80-char cards up to END.
    * Returns (cards, offset-just-past-the-header-padding). */
  private[sources] def parseCards(bytes: Array[Byte], start: Int): (Map[String, String], Int) = {
    val cards = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var off = start
    var done = false
    while (!done) {
      var i = 0
      while (i < 36) {
        if (!done) {
          val card = new String(bytes, off + i * 80, 80, "US-ASCII")
          val key = card.substring(0, 8).trim
          if (key == "END") done = true
          else if (card.length > 9 && card.charAt(8) == '=') {
            val raw = card.substring(10)
            val value =
              if (raw.trim.startsWith("'")) {
                val s = raw.indexOf('\'')
                val e = raw.indexOf('\'', s + 1)
                raw.substring(s + 1, e).trim
              } else {
                val slash = raw.indexOf('/')
                (if (slash >= 0) raw.substring(0, slash) else raw).trim
              }
            cards += key -> value
          }
        }
        i += 1
      }
      off += Block
    }
    (cards.toMap, off)
  }

  /** Walk all HDUs: primary then extensions, data payloads padded. */
  def hdus(bytes: Array[Byte]): Seq[Hdu] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Hdu]
    var off = 0
    while (off + Block <= bytes.length) {
      val (cards, dataStart) = parseCards(bytes, off)
      val naxis = cards.getOrElse("NAXIS", "0").toInt
      val bitpix = math.abs(cards.getOrElse("BITPIX", "8").toInt)
      val axes = (1 to naxis).map(i => cards(s"NAXIS$i").toInt)
      val dataLen =
        if (naxis == 0 || axes.contains(0)) 0
        else bitpix / 8 * axes.product + cards.getOrElse("PCOUNT", "0").toInt
      out += Hdu(cards, dataStart, dataLen)
      off = dataStart + ((dataLen + Block - 1) / Block) * Block
    }
    out.toSeq
  }

  private def typeBytes(code: Char): Int = code match {
    case 'L' | 'A' | 'B' => 1
    case 'I' => 2
    case 'J' | 'E' => 4
    case 'K' | 'D' => 8
    case other => throw new IllegalArgumentException(s"TFORM code '$other'")
  }

  /** Column layout of a BINTABLE HDU from TFIELDS/TTYPEn/TFORMn. */
  def columns(cards: Map[String, String]): Map[String, Col] = {
    val n = cards("TFIELDS").toInt
    var offset = 0
    (1 to n).map { i =>
      val name = cards(s"TTYPE$i")
      val tform = cards(s"TFORM$i")
      val repeat = tform.takeWhile(_.isDigit) match {
        case "" => 1; case d => d.toInt
      }
      val code = tform.dropWhile(_.isDigit).head
      val c = Col(name, repeat, code, offset)
      offset += repeat * typeBytes(code)
      name -> c
    }.toMap
  }

  private def readFloats(buf: ByteBuffer, base: Int, col: Col): Array[Float] = {
    val out = new Array[Float](col.repeat)
    var i = 0
    while (i < col.repeat) {
      out(i) = col.code match {
        case 'E' => buf.getFloat(base + col.offset + i * 4)
        case 'D' => buf.getDouble(base + col.offset + i * 8).toFloat
        case c => throw new IllegalArgumentException(s"float col code '$c'")
      }
      i += 1
    }
    out
  }

  /** Decode the SUBINT table of one archive into long-format rows:
    * (obs_id, subint, pol, chan, bin, value, weight). DATA is laid out
    * bin-fastest (TDIM (nbin, nchan, npol)); value = raw·DAT_SCL +
    * DAT_OFFS per (pol, chan) as in `subdyn.py:474-556`. */
  def decodeSubint(obsId: String, bytes: Array[Byte]): Iterator[(String, Int, Int, Int, Int, Double, Double)] = {
    val all = hdus(bytes)
    val sub = all.find(_.cards.get("EXTNAME").contains("SUBINT"))
      .getOrElse(throw new IllegalArgumentException("no SUBINT HDU"))
    val c = sub.cards
    val nchan = c("NCHAN").toInt
    val npol = c("NPOL").toInt
    val nbin = c("NBIN").toInt
    val nrows = c("NAXIS2").toInt
    val rowBytes = c("NAXIS1").toInt
    val cols = columns(c)
    val buf = ByteBuffer.wrap(bytes) // FITS is big-endian = the default
    val dataCol = cols("DATA")
    require(dataCol.repeat == npol * nchan * nbin,
      s"DATA repeat ${dataCol.repeat} != $npol*$nchan*$nbin")
    (0 until nrows).iterator.flatMap { r =>
      val base = sub.dataStart + r * rowBytes
      val wts = readFloats(buf, base, cols("DAT_WTS"))
      val scl = readFloats(buf, base, cols("DAT_SCL"))
      val offs = readFloats(buf, base, cols("DAT_OFFS"))
      for {
        pol <- (0 until npol).iterator
        chan <- (0 until nchan).iterator
        bin <- (0 until nbin).iterator
      } yield {
        val flat = (pol * nchan + chan) * nbin + bin
        val raw = dataCol.code match {
          case 'I' => buf.getShort(base + dataCol.offset + flat * 2).toDouble
          case 'E' => buf.getFloat(base + dataCol.offset + flat * 4).toDouble
          case other => throw new IllegalArgumentException(s"DATA code '$other'")
        }
        val pc = pol * nchan + chan
        (obsId, r, pol, chan, bin, raw * scl(pc) + offs(pc), wts(chan).toDouble)
      }
    }
  }

  /** Weights-only decode: reads just the DAT_WTS vector per subint row —
    * the weights relation is nbin·npol times smaller than the samples, so
    * its plan must not pay the full cube decode. */
  def decodeWeights(obsId: String, bytes: Array[Byte]): Iterator[(String, Int, Int, Double)] = {
    val sub = hdus(bytes).find(_.cards.get("EXTNAME").contains("SUBINT"))
      .getOrElse(throw new IllegalArgumentException("no SUBINT HDU"))
    val c = sub.cards
    val nrows = c("NAXIS2").toInt
    val rowBytes = c("NAXIS1").toInt
    val cols = columns(c)
    val buf = ByteBuffer.wrap(bytes)
    (0 until nrows).iterator.flatMap { r =>
      val wts = readFloats(buf, sub.dataStart + r * rowBytes, cols("DAT_WTS"))
      wts.iterator.zipWithIndex.map { case (w, chan) =>
        (obsId, r, chan, w.toDouble)
      }
    }
  }

  private def obsIdOf(path: String, bytes: Array[Byte]): String =
    hdus(bytes).headOption.flatMap(_.cards.get("OBS_ID"))
      .getOrElse(path.split('/').last)

  /** Archive glob → Cube. obs_id comes from the primary header's OBS_ID
    * card, falling back to the file name. The two relations are two
    * independent scans of the same files, but the weights scan decodes
    * ONLY the DAT_WTS vectors — the expensive cube decode runs once per
    * samples action, never for weights. */
  def subintCube(spark: SparkSession, glob: String): Cube = {
    import spark.implicits._
    def files = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val samples = files
      .flatMap { case (path, bytes) => decodeSubint(obsIdOf(path, bytes), bytes) }
      .toDF("obs_id", "subint", "pol", "chan", "bin", "value", "weight")
      .drop("weight")
    val weights = files
      .flatMap { case (path, bytes) => decodeWeights(obsIdOf(path, bytes), bytes) }
      .toDF("obs_id", "subint", "chan", "weight")
    Cube(samples, weights)
  }
}
