package graft.operators

import graft.SparkSpecBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The INCREMENTAL (manifest) seal: delta-proportional physical writes,
  * cross-version copy reuse, redaction through shared copies, and gc's
  * delete-only refcount. */
class SnapshotsIncrementalSpec extends SparkSpecBase {
  import spark.implicits._

  // 20 docs in 4 batches of 5 (batch = home day), decision-table shape
  private def rowsOf(ids: Seq[Long]): DataFrame =
    ids.toDF("doc_id")
      .withColumn("batch", floor((col("doc_id") - 1L) / 5L) * 5L)
      .withColumn("keep", col("doc_id") % 7 =!= 0)
      .withColumn("split", when(col("doc_id") % 4 === 0, "val")
        .otherwise("train"))
      .withColumn("component", col("doc_id") % 6)
      .withColumn("fp", col("doc_id") * 31L)
      .withColumn("len", col("doc_id") * 3L)

  private def canon(df: DataFrame): Array[String] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols: _*).collect().map(_.toString).sorted
  }

  private def physicalBatches(root: String, v: Long, k: Long): Set[Long] = {
    val p = new Path(s"$root/snap/v=$v/r=$k")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Set.empty
    else f.listStatus(p).map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") =>
        s.stripPrefix("batch=").toLong }.toSet
  }

  test("incremental seal equals the full seal; only changed batches are copied") {
    val root = tempDir("snapinc")
    val all = (1L to 20L)
    val v1 = Snapshots.createIncremental(spark, root, rowsOf(all))
    assert(physicalBatches(root, v1, 0L) == Set(0L, 5L, 10L, 15L),
      "first manifest seal must own every batch")
    assert(canon(Snapshots.open(spark, root, v1))
      .sameElements(canon(rowsOf(all))),
      "manifest open diverged from the sealed rows")

    // day 2: batch 15 gains a row (doc 21 lands in a NEW batch 20, and
    // doc 18's decision flips) — batches 20 and 15 change, 0/5/10 don't
    val day2 = rowsOf(all :+ 21L)
      .withColumn("keep",
        when(col("doc_id") === 18L, lit(false)).otherwise(col("keep")))
    val v2 = Snapshots.createIncremental(spark, root, day2)
    assert(physicalBatches(root, v2, 0L) == Set(15L, 20L),
      s"second seal copied ${physicalBatches(root, v2, 0L)} — unchanged " +
        "batches must be referenced, not rewritten")
    assert(canon(Snapshots.open(spark, root, v2)).sameElements(canon(day2)),
      "incremental seal's reconstruction diverged")
    // v1 still reads the ORIGINAL rows (sealed history is immutable)
    assert(canon(Snapshots.open(spark, root, v1))
      .sameElements(canon(rowsOf(all))))
    assert(Snapshots.sealedRows(spark, root, v1) == 20L)
    assert(Snapshots.sealedRows(spark, root, v2) == 21L)
  }

  test("a zero-change seal writes no data files at all") {
    val root = tempDir("snapzero")
    val v1 = Snapshots.createIncremental(spark, root, rowsOf(1L to 20L))
    val v2 = Snapshots.createIncremental(spark, root, rowsOf(1L to 20L))
    assert(physicalBatches(root, v2, 0L).isEmpty,
      "an unchanged corpus re-sealed must reference everything")
    assert(canon(Snapshots.open(spark, root, v2))
      .sameElements(canon(Snapshots.open(spark, root, v1))))
  }

  test("redact rewrites only victim-bearing batches in every sharing version") {
    val root = tempDir("snapincred")
    val v1 = Snapshots.createIncremental(spark, root, rowsOf(1L to 20L))
    val v2 = Snapshots.createIncremental(spark, root, rowsOf(1L to 21L))
    // victims live in batch 5 only (docs 6 and 9)
    Snapshots.redact(spark, root, Seq(6L, 9L).toDF("doc_id"))
    for (v <- Seq(v1, v2)) {
      val got = Snapshots.open(spark, root, v)
      assert(got.filter(col("doc_id").isin(6L, 9L)).isEmpty,
        s"v=$v still serves forgotten docs")
      assert(physicalBatches(root, v, 1L) == Set(5L),
        s"v=$v's redact revision copied more than the victim batch: " +
          s"${physicalBatches(root, v, 1L)}")
    }
    assert(Snapshots.sealedRows(spark, root, v1) == 18L,
      "sealedRows does not track the redaction")
    // an untouched batch's copy is still v1's original file
    assert(physicalBatches(root, v1, 0L).contains(0L))
  }

  test("gc keeps a retired version's copies while a live manifest references them") {
    val root = tempDir("snapincgc")
    val v1 = Snapshots.createIncremental(spark, root, rowsOf(1L to 20L))
    val v2 = Snapshots.createIncremental(spark, root, rowsOf(1L to 21L))
    // retire v1; v2 references v1's batches 0/5/10/15
    Snapshots.gc(spark, root, keep = _ == v2, graceMs = 0L)
    assert(Snapshots.versions(spark, root) == Seq(v2))
    assert(physicalBatches(root, v1, 0L) == Set(0L, 5L, 10L, 15L),
      "gc deleted copies a live manifest still references")
    assert(canon(Snapshots.open(spark, root, v2))
      .sameElements(canon(rowsOf(1L to 21L))),
      "v2 unreadable after v1's retirement")
    // the retired marker persists until the data is fully collectible —
    // and the number is never reallocated meanwhile
    val v3 = Snapshots.createIncremental(spark, root, rowsOf(1L to 21L))
    assert(v3 == v2 + 1L, "retired-in-refcount number was re-used")
    // retire v2 as well: v3 took over the references (its seal copied
    // v2's pointers), so v1's copies must STILL survive
    Snapshots.gc(spark, root, keep = _ == v3, graceMs = 0L)
    assert(physicalBatches(root, v1, 0L).nonEmpty,
      "gc dropped copies v3's manifest still references")
    assert(canon(Snapshots.open(spark, root, v3))
      .sameElements(canon(rowsOf(1L to 21L))))
    // retire everything: now every copy loses its last referrer
    Snapshots.gc(spark, root, keep = _ => false, graceMs = 0L)
    assert(Snapshots.versions(spark, root).isEmpty)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(s"$root/snap/v=$v1")),
      "fully-unreferenced retired version's data survived the sweep")
    assert(!f.exists(new Path(s"$root/seal/.retired-v=$v1.txt")),
      "retired marker survived after its data was collected")
  }

  test("a crashed incremental seal is invisible; the replay burns the number and converges") {
    val root = tempDir("snapinccrash")
    val v1 = Snapshots.createIncremental(spark, root, rowsOf(1L to 20L))
    // simulate a create that crashed AFTER its revision publish (data +
    // manifest + marker durable) but BEFORE the seal-marker commit
    val v2 = Snapshots.createIncremental(spark, root, rowsOf(1L to 21L))
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.delete(new Path(s"$root/seal/v=$v2.txt"), false))
    assert(Snapshots.versions(spark, root) == Seq(v1),
      "unsealed debris is visible")
    // the replay (different rows — the day re-ran differently) allocates
    // a FRESH number (the hwm burned v2; re-using it would ambiguate any
    // record that ever mentioned it) and reconstructs correctly
    val v3 = Snapshots.createIncremental(spark, root, rowsOf(1L to 19L))
    assert(v3 == v2 + 1L, s"crashed seal's number re-used (got $v3)")
    assert(canon(Snapshots.open(spark, root, v3))
      .sameElements(canon(rowsOf(1L to 19L))))
    assert(canon(Snapshots.open(spark, root, v1))
      .sameElements(canon(rowsOf(1L to 20L))))
    // the debris never pins real copies forever: aged gc sweeps it
    Snapshots.gc(spark, root, keep = _ => true, graceMs = 0L)
    assert(!f.exists(new Path(s"$root/snap/v=$v2")),
      "crashed incremental seal's debris survived gc")
  }

  test("a takedown that empties every batch leaves the version openable at zero rows") {
    val root = tempDir("snapincempty")
    val v = Snapshots.createIncremental(spark, root,
      rowsOf(Seq(2L, 4L)))
    Snapshots.redact(spark, root, Seq(2L, 4L).toDF("doc_id"))
    assert(Snapshots.versions(spark, root) == Seq(v))
    assert(Snapshots.open(spark, root, v).count() == 0L)
    assert(Snapshots.sealedRows(spark, root, v) == 0L)
  }

  test("exports and diffs run off the manifest reconstruction") {
    val root = tempDir("snapincexp")
    val docs = (1L to 21L)
      .map(i => (i, if (i % 2 == 0) "en" else "de", s"w$i tok tok$i"))
      .toDF("doc_id", "lang", "text")
    val fps = Snapshots.fingerprints(docs)
    def sealRows(ids: Seq[Long]) = rowsOf(ids).drop("fp", "len")
      .join(fps, Seq("doc_id"))
    val v1 = Snapshots.createIncremental(spark, root, sealRows(1L to 20L))
    val v2 = Snapshots.createIncremental(spark, root, sealRows(1L to 21L))
    Snapshots.exportShards(spark, root, v2, docs, ctx = 8, chunk = 2)
    val m = Snapshots.openShards(spark, root, v2)
    assert(m.select("doc_id").distinct().count() ==
      sealRows(1L to 21L).filter(col("keep")).count(),
      "export did not cover the manifest-reconstructed kept set")
    val d = Snapshots.diff(spark, root, v1, v2,
      compare = Seq("keep", "split", "component"))
    assert(d.count() == 1L && d.head.getLong(0) == 21L,
      "cross-version diff over manifest reconstructions is wrong")
  }

  test("a non-default batchCol is normalized to the physical batch= layout") {
    val root = tempDir("snapinccol")
    val rows = rowsOf(1L to 20L).withColumnRenamed("batch", "day")
    val v = Snapshots.createIncremental(spark, root, rows, batchCol = "day")
    // physical layout is batch= regardless of the caller's name — the
    // readers, redact, and gc's revision sweep all resolve batch= dirs
    assert(physicalBatches(root, v, 0L) == Set(0L, 5L, 10L, 15L),
      "non-default batchCol did not normalize to batch= dirs")
    assert(canon(Snapshots.open(spark, root, v))
      .sameElements(canon(rowsOf(1L to 20L))),
      "sealed data must read back with the partition column named batch")
    // the takedown path (the sweep ADVICE flagged) works over it
    Snapshots.redact(spark, root, Seq(3L).toDF("doc_id"))
    Snapshots.gc(spark, root, keep = _ => true, graceMs = 0L)
    assert(canon(Snapshots.open(spark, root, v))
      .sameElements(canon(rowsOf(1L to 20L).filter(col("doc_id") =!= 3L))),
      "redact+gc over a normalized seal lost or resurrected rows")
    // a batchCol clashing with an existing batch column is refused
    val clash = intercept[IllegalArgumentException] {
      Snapshots.createIncremental(spark, root,
        rowsOf(1L to 5L).withColumn("day", col("batch")), batchCol = "day")
    }
    assert(clash.getMessage.contains("clashes"))
  }

  test("the seal checksum is multiset-sensitive: swapped duplicate rows read as changed") {
    val root = tempDir("snapincdup")
    // batch 0 holds the pair {A, A} (two identical rows after dropping
    // the id): a multiplicity-blind xor cancels them, so replacing the
    // pair with {C, C} preserved count AND xor and the seal silently
    // referenced the stale copy
    def dupRows(fp: Long): DataFrame =
      Seq((1L, fp), (2L, fp), (6L, 99L)).toDF("doc_id", "fp")
        .withColumn("batch", floor((col("doc_id") - 1L) / 5L) * 5L)
        .drop("doc_id")
    val v1 = Snapshots.createIncremental(spark, root, dupRows(7L))
    val v2 = Snapshots.createIncremental(spark, root, dupRows(13L))
    assert(physicalBatches(root, v2, 0L).contains(0L),
      "swapping a duplicated pair went undetected — the checksum is " +
        "multiplicity-blind again")
    assert(canon(Snapshots.open(spark, root, v2))
      .sameElements(canon(dupRows(13L))),
      "v2 must read the NEW duplicated pair, not v1's stale copy")
    assert(canon(Snapshots.open(spark, root, v1))
      .sameElements(canon(dupRows(7L))), "v1's sealed history moved")
  }
}
