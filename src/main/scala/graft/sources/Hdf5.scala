package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2: HDF5 attribute-only ingest — the subset of HDF5 the reference
  * actually touches. `fluxcal/lofar_fluxcal.py:151-172`,
  * `fluxcal/get_flagged_tiles.py:53-61` and
  * `tiles/lofar_antenna_state/getState.py:219` open a `.h5` file and read
  * exactly three ROOT-GROUP attributes (`FILTER_SELECTION`,
  * `OBSERVATION_STATIONS_LIST`, `OBSERVATION_START_UTC`) — no datasets,
  * no sub-groups. So, as with FITS (`Psrfits`) and sigproc
  * (`SigprocHeader`), the published file format is parsed directly: the
  * superblock locates the root object header, whose attribute messages
  * carry name + datatype + dataspace + raw value inline.
  *
  * Format coverage (HDF5 is a public spec; this is the attribute slice):
  *  - superblock v0/v1 (classic, what the HDF5 1.6/1.8 library writes by
  *    default) and v2/v3;
  *  - object header v1, including continuation blocks; v2 ("OHDR")
  *    without attribute-creation-order tracking;
  *  - attribute message v1 (8-byte-padded sections) and v3 (packed, with
  *    a name-encoding byte);
  *  - datatypes: fixed-point ints, IEEE floats, fixed-length strings,
  *    and variable-length strings through the global heap ("GCOL");
  *  - dataspaces: scalar and simple 1-D.
  *  Little-endian offsets/lengths of size 8, the only layout the HDF5
  *  library emits on commodity hardware. Anything outside the slice
  *  fails loudly with the offending detail rather than mis-parsing.
  *
  * Distribution: metadata files are KB-sized and one-per-observation; a
  * fleet of them parallelizes by file through `binaryFile` exactly like
  * S3/S4, and the resulting obs_meta dimension broadcasts downstream.
  */
object Hdf5 {

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  /** Root-group attributes as (name → value); values are String,
    * Seq[String], Long, Double, Seq[Long] or Seq[Double]. */
  def rootAttributes(bytes: Array[Byte]): Map[String, Any] = {
    require(bytes.length >= 64 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not an HDF5 file (bad signature)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sbVersion = bytes(8) & 0xff
    val rootHeader = sbVersion match {
      case 0 | 1 =>
        require((bytes(13) & 0xff) == 8 && (bytes(14) & 0xff) == 8,
          s"unsupported offset/length size ${bytes(13)}/${bytes(14)}")
        // v0: ...flags end at 24; v1 inserts 2+2 bytes of indexed-storage k
        val addrs = if (sbVersion == 0) 24 else 28
        // base(8) free-space(8) eof(8) driver-info(8), then the root group
        // SYMBOL TABLE ENTRY: link name offset(8), object header address(8)
        buf.getLong(addrs + 32 + 8)
      case 2 | 3 =>
        require((bytes(9) & 0xff) == 8 && (bytes(10) & 0xff) == 8,
          s"unsupported offset/length size ${bytes(9)}/${bytes(10)}")
        buf.getLong(36)
      case v => throw new IllegalArgumentException(s"unsupported superblock version $v")
    }
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    if (bytes(rootHeader.toInt) == 'O' && bytes(rootHeader.toInt + 1) == 'H' &&
        bytes(rootHeader.toInt + 2) == 'D' && bytes(rootHeader.toInt + 3) == 'R')
      parseV2Header(bytes, buf, rootHeader.toInt, attrs)
    else
      parseV1Header(bytes, buf, rootHeader.toInt, attrs)
    attrs.toMap
  }

  // ---------------------------------------------------------- object headers

  private def parseV1Header(bytes: Array[Byte], buf: ByteBuffer, at: Int,
                            out: scala.collection.mutable.Map[String, Any]): Unit = {
    require((bytes(at) & 0xff) == 1, s"object header version ${bytes(at)} at $at")
    val headerSize = buf.getInt(at + 8)
    // 12 header bytes + 4 alignment pad, then `headerSize` bytes of messages
    parseMessageBlock(bytes, buf, at + 16, headerSize, v1 = true, out)
  }

  /** One run of v1/v2 messages; recurses into continuation blocks. */
  private def parseMessageBlock(bytes: Array[Byte], buf: ByteBuffer, start: Int,
                                size: Int, v1: Boolean,
                                out: scala.collection.mutable.Map[String, Any]): Unit = {
    var off = start
    val end = start + size
    // v1 message prefix is 8 bytes (type 2, size 2, flags 1, reserved 3);
    // v2 is 4 (type 1, size 2, flags 1) — creation-order tracking rejected
    // by the caller, so no optional field here.
    val prefix = if (v1) 8 else 4
    while (off + prefix <= end) {
      val msgType = if (v1) buf.getShort(off) & 0xffff else bytes(off) & 0xff
      val msgSize = buf.getShort(off + (if (v1) 2 else 1)) & 0xffff
      val body = off + prefix
      if (body + msgSize > end) return // v2 trailing gap before the checksum
      msgType match {
        case 0x0C => parseAttribute(bytes, buf, body, out)
        case 0x10 => // continuation: offset(8), length(8)
          val contAt = buf.getLong(body)
          val contLen = buf.getLong(body + 8)
          // v2 continuation blocks open with "OCHK" and close with a checksum
          val (s, l) =
            if (!v1 && bytes(contAt.toInt) == 'O' && bytes(contAt.toInt + 1) == 'C')
              (contAt.toInt + 4, contLen.toInt - 8)
            else (contAt.toInt, contLen.toInt)
          parseMessageBlock(bytes, buf, s, l, v1, out)
        case _ => () // NIL, symbol table, … — not attribute-bearing
      }
      off = body + msgSize
      if (v1) off = (off + 7) & ~7 // v1 messages are 8-byte aligned
    }
  }

  private def parseV2Header(bytes: Array[Byte], buf: ByteBuffer, at: Int,
                            out: scala.collection.mutable.Map[String, Any]): Unit = {
    val flags = bytes(at + 5) & 0xff
    require((flags & 0x04) == 0,
      "attribute-creation-order tracking not supported (flags bit 2)")
    var off = at + 6
    if ((flags & 0x20) != 0) off += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) off += 4  // max compact / min dense attrs
    val chunkSizeBytes = 1 << (flags & 0x03)
    val chunk0 = chunkSizeBytes match {
      case 1 => bytes(off) & 0xffL
      case 2 => buf.getShort(off) & 0xffffL
      case 4 => buf.getInt(off) & 0xffffffffL
      case _ => buf.getLong(off)
    }
    off += chunkSizeBytes
    parseMessageBlock(bytes, buf, off, chunk0.toInt, v1 = false, out)
  }

  // ------------------------------------------------------ attribute message

  private def parseAttribute(bytes: Array[Byte], buf: ByteBuffer, at: Int,
                             out: scala.collection.mutable.Map[String, Any]): Unit = {
    val version = bytes(at) & 0xff
    require(version == 1 || version == 2 || version == 3,
      s"attribute message version $version")
    val nameSize = buf.getShort(at + 2) & 0xffff
    val dtSize = buf.getShort(at + 4) & 0xffff
    val dsSize = buf.getShort(at + 6) & 0xffff
    var off = at + 8
    if (version == 3) off += 1 // name character-set encoding byte
    def pad8(n: Int) = if (version == 1) (n + 7) & ~7 else n
    val name = new String(bytes, off, nameSize, "UTF-8").takeWhile(_ != '\u0000')
    off += pad8(nameSize)
    val dtAt = off
    off += pad8(dtSize)
    val dsAt = off
    off += pad8(dsSize)
    out += name -> readValue(bytes, buf, dtAt, dsAt, off)
  }

  private final case class Datatype(cls: Int, size: Int, bits0: Int, signed: Boolean)

  private def parseDatatype(bytes: Array[Byte], buf: ByteBuffer, at: Int): Datatype = {
    val clsVer = bytes(at) & 0xff
    Datatype(clsVer & 0x0f, buf.getInt(at + 4), bytes(at + 1) & 0xff,
      signed = ((bytes(at + 1) & 0x08) != 0))
  }

  /** Dataspace → element count, or -1 for rank > 1 (unsupported). */
  private def elementCount(bytes: Array[Byte], buf: ByteBuffer, at: Int): Long = {
    val version = bytes(at) & 0xff
    val rank = bytes(at + 1) & 0xff
    val dimsAt = if (version == 1) at + 8 else at + 4
    rank match {
      case 0 => 0L // scalar
      case 1 => buf.getLong(dimsAt)
      case _ => -1L
    }
  }

  private def readValue(bytes: Array[Byte], buf: ByteBuffer,
                        dtAt: Int, dsAt: Int, dataAt: Int): Any = {
    val dt = parseDatatype(bytes, buf, dtAt)
    val n = elementCount(bytes, buf, dsAt)
    require(n >= 0, "attributes with rank > 1 not supported")
    val scalar = n == 0L
    val count = if (scalar) 1 else n.toInt
    def one(i: Int): Any = {
      val at = dataAt + i * dt.size
      dt.cls match {
        case 0 => // fixed-point
          dt.size match {
            case 1 => (if (dt.signed) bytes(at).toLong else bytes(at) & 0xffL)
            case 2 => (if (dt.signed) buf.getShort(at).toLong else buf.getShort(at) & 0xffffL)
            case 4 => (if (dt.signed) buf.getInt(at).toLong else buf.getInt(at) & 0xffffffffL)
            case 8 => buf.getLong(at)
            case s => throw new IllegalArgumentException(s"int size $s")
          }
        case 1 => // IEEE float
          dt.size match {
            case 4 => buf.getFloat(at).toDouble
            case 8 => buf.getDouble(at)
            case s => throw new IllegalArgumentException(s"float size $s")
          }
        case 3 => // fixed-length string, NUL-padded
          new String(bytes, at, dt.size, "UTF-8").takeWhile(_ != '\u0000')
        case 9 if (dt.bits0 & 0x0f) == 1 => // variable-length string
          // element = length(4) + global heap collection address(8) + index(4)
          val len = buf.getInt(dataAt + i * 16)
          val heapAt = buf.getLong(dataAt + i * 16 + 4)
          val index = buf.getInt(dataAt + i * 16 + 12)
          globalHeapObject(bytes, buf, heapAt.toInt, index, len)
        case c => throw new IllegalArgumentException(s"datatype class $c not supported")
      }
    }
    if (scalar) one(0) else Vector.tabulate(count)(one)
  }

  /** Global heap collection lookup: "GCOL" header then (index, refcount,
    * size, data) objects, 8-byte aligned; index 0 terminates. */
  private def globalHeapObject(bytes: Array[Byte], buf: ByteBuffer,
                               at: Int, index: Int, len: Int): String = {
    require(bytes(at) == 'G' && bytes(at + 1) == 'C' && bytes(at + 2) == 'O' &&
      bytes(at + 3) == 'L', s"no global heap collection at $at")
    val collSize = buf.getLong(at + 8)
    var off = at + 16
    val end = at + collSize.toInt
    while (off + 16 <= end) {
      val objIndex = buf.getShort(off) & 0xffff
      val objSize = buf.getLong(off + 8)
      if (objIndex == 0) // free-space terminator
        throw new IllegalArgumentException(s"heap object $index not found at $at")
      if (objIndex == index)
        return new String(bytes, off + 16, len, "UTF-8")
      off += 16 + ((objSize.toInt + 7) & ~7)
    }
    throw new IllegalArgumentException(s"heap object $index not found at $at")
  }

  // ------------------------------------------------------------- Spark side

  /** Observation metadata dimension from a fleet of `.h5` files — the
    * station-count logic of `fluxcal/lofar_fluxcal.py:151-172`: antenna
    * band from FILTER_SELECTION, core stations counted by the "CS"
    * prefix, HBA core stations halved (the list holds ear sub-stations),
    * and a lone remote/international fallback to the full list length. */
  def obsMeta(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val a = rootAttributes(bytes)
        val bandFilter = a.get("FILTER_SELECTION").map(_.toString).getOrElse("")
        val antenna = bandFilter.split("_").headOption.getOrElse("")
        val stations = a.get("OBSERVATION_STATIONS_LIST") match {
          case Some(s: Seq[_]) => s.map(_.toString)
          case Some(s) => Seq(s.toString)
          case None => Seq.empty[String]
        }
        val core = stations.count(_.startsWith("CS"))
        val nCore0 = if (antenna == "HBA") core / 2 else core
        val nCore = if (nCore0 == 0) stations.length else nCore0
        val startUtc = a.get("OBSERVATION_START_UTC").map(_.toString).orNull
        (path, bandFilter, antenna, stations, nCore, startUtc)
      }
      .toDF("path", "filter_selection", "antenna", "stations",
        "n_core_stations", "start_utc")
  }
}
