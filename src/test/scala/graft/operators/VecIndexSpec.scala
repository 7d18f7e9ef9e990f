package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The persistent IVF index's scale contracts: partitioned layout on
  * disk, partition-pruned search scans, and search results identical to
  * the inline in-cell plan (q55's shape) over the same assignments.
  */
class VecIndexSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private lazy val path = {
    val dir = tempDir("vecindex")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    VecIndex.build(emb, "vec_id", "embedding", cents, dir)
    dir
  }

  test("build lays the index out partitioned by cell id") {
    val cellDirs = new java.io.File(s"$path/cells/v=1").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cid=")).sorted
    assert(cellDirs.nonEmpty, "no cid= partition directories")
    val idx = VecIndex.open(spark, path)
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(idx.count() == nVec, "index row count != corpus size")
    assert(idx.select(col("cid")).distinct().count() == cellDirs.length.toLong)
  }

  test("search prunes to the probed cells' partitions") {
    val idx = VecIndex.open(spark, path)
    val probes = idx.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val res = VecIndex.search(idx, probes, "vec_id", "embedding", k = 5)
    val scan = res.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cid"),
      s"search scan is not partition-pruned on cid:\n$scan")
    // the pushed filter must not be the trivial always-true one
    assert(!scan.contains("PartitionFilters: []"),
      s"empty partition filter — the whole index would be read:\n$scan")
  }

  test("search equals the inline in-cell exact plan") {
    val idx = VecIndex.open(spark, path)
    val probes = idx.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val got = VecIndex.search(idx, probes, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    // reference: same cells, brute-force cosine rerank via DataFrame ops
    val exact = idx.as("x").join(probes.as("p"),
        col("x.cid") === col("p.q_cid") && col("x.vec_id") =!= col("p.q_id"))
      .withColumn("cos",
        call_function("float_dot", col("x.embedding"), col("p.q_vec")) /
          (col("x.norm") * sqrt(call_function("float_dot", col("p.q_vec"), col("p.q_vec")))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("x.vec_id").asc)))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("x.vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(got.sameElements(exact), "persisted-index search diverged from inline plan")
  }

  test("rangeSearch equals the inline in-cell threshold filter, self included") {
    val idx = VecIndex.open(spark, path)
    val probes = idx.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val minCos = 0.25
    val got = VecIndex.rangeSearch(idx, probes, "vec_id", "embedding", minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val exact = idx.as("x").join(probes.as("p"), col("x.cid") === col("p.q_cid"))
      .withColumn("cos",
        call_function("float_dot", col("x.embedding"), col("p.q_vec")) /
          (col("x.norm") * sqrt(call_function("float_dot", col("p.q_vec"), col("p.q_vec")))))
      .filter(col("cos") >= minCos)
      .select(col("q_id"), col("x.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(exact), "rangeSearch diverged from inline threshold plan")
    // a probe in the index must find its own copy (cos = 1): range search
    // keeps self-matches — the decontamination semantics
    assert(got.exists { case (q, v) => q == v },
      "rangeSearch dropped self-matches")
    val p = VecIndex.rangeSearch(idx, probes, "vec_id", "embedding", minCos)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && !p.contains("PartitionFilters: []"),
      s"rangeSearch scan is not partition-pruned:\n$p")
  }

  test("assignFold matches the window-based assign on batch input") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val viaWindow = KMeans.assign(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val viaFold = VecIndex.assignFold(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(viaFold.sameElements(viaWindow), "fold assign diverged from window assign")
  }

  test("appendStream lands new vectors in their cell partitions (exactly-once sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecappend")
    val ckpt = tempDir("vecappend-ckpt")
    val batch = emb.limit(32)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = VecIndex.appendStream(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, dir, ckpt)
    try {
      input.addData(batch.take(16))
      q.processAllAvailable()
      input.addData(batch.drop(16))
      q.processAllAvailable()
    } finally q.stop()
    val idx = VecIndex.open(spark, dir)
    assert(idx.count() == 32, "streamed rows missing from the index")
    val streamed = idx.select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val expected = VecIndex.assignFold(emb.limit(32), "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(streamed.sameElements(expected), "streamed assignments diverged from batch")
    // the lineage layout: per-micro-batch b= partitions, cells nested
    val batchDirs = new java.io.File(s"$dir/delta/e=1").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b="))
    assert(batchDirs.length == 2,
      s"expected one b= dir per micro-batch: ${batchDirs.map(_.getName).toSeq}")
    assert(batchDirs.forall(_.listFiles().exists(_.getName.startsWith("cid="))),
      "no cid= partition directories in the streamed delta batches")
    // and the b= replay key never leaks into the reader's schema
    assert(!idx.columns.contains("b"), s"b leaked: ${idx.columns.toSeq}")
  }

  test("compact merges streamed small files; rows, layout, and pruning survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("veccompact")
    val ckpt = tempDir("veccompact-ckpt")
    val batch = emb.limit(48)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = VecIndex.appendStream(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, dir, ckpt)
    try { // three micro-batches -> up to three files per touched cell
      batch.grouped(16).foreach { g =>
        input.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()
    // cid → data-file count over the files the LIVE index actually
    // reads (robust to the versioned layout: inputFiles resolves the
    // current manifest's cells version + delta epoch)
    def dataFiles(d: String): Map[String, Int] =
      VecIndex.open(spark, d).inputFiles.toSeq
        .map(f => new java.io.File(f.stripPrefix("file:")).getParentFile.getName)
        .filter(_.startsWith("cid="))
        .groupMapReduce(identity)(_ => 1)(_ + _)
    def rows(d: String): Array[(Long, Int)] =
      VecIndex.open(spark, d).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    val before = dataFiles(dir)
    val beforeRows = rows(dir)
    assert(before.values.max > 1, s"setup is vacuous — no cell has multiple files: $before")
    VecIndex.compact(spark, dir, "vec_id")
    val after = dataFiles(dir)
    assert(rows(dir).sameElements(beforeRows), "compaction changed the row set")
    assert(after.keySet == before.keySet, "compaction changed the cell layout")
    assert(after.values.sum < before.values.sum,
      s"compaction did not reduce file count: $before -> $after")
    VecIndex.compact(spark, dir, "vec_id") // idempotent: second run is a no-op reshuffle
    assert(rows(dir).sameElements(beforeRows), "second compaction changed the row set")
    assert(dataFiles(dir) == after, "second compaction changed the file layout")
    val probes = VecIndex.open(spark, dir).filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val res = VecIndex.search(VecIndex.open(spark, dir), probes, "vec_id", "embedding", k = 5)
    val scan = res.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && !scan.contains("PartitionFilters: []"),
      s"compacted index search lost partition pruning:\n$scan")
  }

  test("multi-probe: a probe row per extra cell widens recall, stays pruned") {
    val idx = VecIndex.open(spark, path)
    // probe 0 searches its own cell plus cell (cid+1) mod nCells
    val nCells = idx.select(col("cid")).distinct().count()
    val base = idx.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("cid"))
    val probes = base.select(col("q_id"), col("q_vec"), col("cid").as("q_cid"))
      .unionByName(base.select(col("q_id"), col("q_vec"),
        ((col("cid") + 1) % nCells).cast("int").as("q_cid")))
    val single = VecIndex.search(idx,
      probes.limit(1), "vec_id", "embedding", k = 50).count()
    val multi = VecIndex.search(idx, probes, "vec_id", "embedding", k = 50).count()
    assert(multi >= single, "multi-probe returned fewer candidates")
  }

  test("delete(build(A ∪ B), ids(B)) equals build(A) — the retraction path") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    val delDir = tempDir("vecdel")
    val aDir = tempDir("vecdel_a")
    VecIndex.build(emb, "vec_id", "embedding", cents, delDir)
    VecIndex.build(a, "vec_id", "embedding", cents, aDir)
    VecIndex.delete(spark, delDir, "vec_id", b.select("vec_id"))
    def rows(d: String) =
      VecIndex.open(spark, d).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(rows(delDir).sameElements(rows(aDir)),
      "post-delete index diverges from build(A)")
    // absent ids are no-ops
    import spark.implicits._
    VecIndex.delete(spark, delDir, "vec_id", Seq(-1L).toDF("vec_id"))
    assert(rows(delDir).sameElements(rows(aDir)),
      "deleting absent ids changed the index")
  }

  test("delete size-gate: the forced shuffle-join branch (maxBroadcastIds=0) is result-identical") {
    // the count gate's join fallback (a source-scale retraction too big
    // to broadcast) must produce the same index as the broadcast path
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    val delDir = tempDir("vecdelgate")
    val aDir = tempDir("vecdelgate_a")
    VecIndex.build(emb, "vec_id", "embedding", cents, delDir)
    VecIndex.build(a, "vec_id", "embedding", cents, aDir)
    VecIndex.delete(spark, delDir, "vec_id", b.select("vec_id"),
      maxBroadcastIds = 0L)
    def rows(d: String) =
      VecIndex.open(spark, d).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(rows(delDir).sameElements(rows(aDir)),
      "shuffle-join delete branch diverges from build(A)")
  }

  test("delete is CELL-PRUNED: victim cells rewritten, the rest referenced, gc keeps the chain") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecdelprune")
    VecIndex.build(emb, "vec_id", "embedding", cents, dir)
    def cidDirs(v: Long): Seq[String] = {
      val d = new java.io.File(s"$dir/cells/v=$v")
      if (!d.exists) Seq.empty
      else d.listFiles.filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith("cid=")).toSeq.sorted
    }
    def rows(): Array[(Long, Int)] =
      VecIndex.open(spark, dir).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    val all0 = rows()
    assert(cidDirs(1).size > 1, "fixture vacuous: fewer than 2 cells")
    // one victim → exactly its cell's dir is written under v=2, every
    // other cell is REFERENCED at v=1 (no physical copy)
    val (vid, vcid) = all0.head
    VecIndex.delete(spark, dir, "vec_id", Seq(vid).toDF("vec_id"))
    assert(cidDirs(2) == Seq(s"cid=$vcid"),
      s"pruned delete rewrote more than the victim's cell: ${cidDirs(2)}")
    val want1 = all0.filterNot(_._1 == vid)
    assert(rows().sameElements(want1), "pruned delete lost or kept wrong rows")
    // the chain-referenced version survives an IMMEDIATE zero-grace gc
    VecIndex.gc(spark, dir, 0L)
    assert(cidDirs(1).nonEmpty, "gc deleted a chain-referenced cells version")
    assert(rows().sameElements(want1), "post-gc read diverged")
    // a CHAINED delete from a different cell stacks a second overlay
    val (vid2, vcid2) = want1.find(_._2 != vcid).get
    VecIndex.delete(spark, dir, "vec_id", Seq(vid2).toDF("vec_id"))
    assert(cidDirs(3) == Seq(s"cid=$vcid2"),
      s"chained delete rewrote more than its victim's cell: ${cidDirs(3)}")
    val want2 = want1.filterNot(_._1 == vid2)
    assert(rows().sameElements(want2), "chained delete diverged")
    // search over the chained index still partition-prunes on cid
    val idx = VecIndex.open(spark, dir)
    val probes = idx.filter(col("vec_id") === want2.head._1)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val scan = VecIndex.search(idx, probes, "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      !scan.contains("PartitionFilters: []"),
      s"search over a pruned-delete chain lost partition pruning:\n$scan")
    // absent ids are PUBLISH-FREE no-ops (no version burned)
    val vBefore = VecIndex.currentVersion(spark, dir)
    VecIndex.delete(spark, dir, "vec_id", Seq(-1L).toDF("vec_id"))
    assert(VecIndex.currentVersion(spark, dir) == vBefore,
      "absent-id delete published a version")
    // compact collapses the chain; the retired overlays become garbage
    VecIndex.compact(spark, dir, "vec_id")
    assert(rows().sameElements(want2), "compact changed the row set")
    VecIndex.gc(spark, dir, 0L)
    assert(cidDirs(1).isEmpty && cidDirs(2).isEmpty && cidDirs(3).isEmpty,
      "gc kept unreferenced chain versions after the compact collapsed it")
    assert(rows().sameElements(want2), "post-collapse read diverged")
    // emptying ONE whole cell while others survive: the new version
    // owns no cid dirs physically (sidecar-only), the emptied cell
    // leaves the reference set, and reads/gc stay consistent
    val compactV = VecIndex.currentVersion(spark, dir) // compact: base == v
    val cellGone = want2.head._2
    VecIndex.delete(spark, dir, "vec_id",
      want2.filter(_._2 == cellGone).map(_._1).toSeq.toDF("vec_id"))
    val want3 = want2.filterNot(_._2 == cellGone)
    assert(rows().sameElements(want3), "whole-cell delete diverged")
    val vNow = VecIndex.currentVersion(spark, dir)
    assert(cidDirs(vNow).isEmpty,
      s"an all-victims cell left physical dirs: ${cidDirs(vNow)}")
    VecIndex.gc(spark, dir, 0L)
    assert(cidDirs(compactV).nonEmpty,
      "gc lost the referenced owner under a sidecar-only version")
    assert(rows().sameElements(want3), "post-gc sidecar-only read diverged")
  }

  test("retrain preserves the vector set, reduces drift skew, keeps search pruning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = tempDir("vecretrain")
    // adversarial day-0 quantizer: four copies of ONE vector as the
    // centroid set — assignFold's lowest-cid tie-break piles EVERY row
    // into cell 0, the degenerate end state of corpus drift
    val one = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    import spark.implicits._
    val degenerate = (0 until 4).map(i => (i, one)).toDF("cid", "centroid")
    VecIndex.build(emb, "vec_id", "embedding", degenerate, dir)
    def occupancy(): Map[Int, Long] =
      VecIndex.open(spark, dir).groupBy(col("cid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = occupancy()
    val n = before.values.sum
    assert(before.size == 1, s"fixture not degenerate: $before")
    def rowSet(d: String): Array[(Long, Seq[Float], Double)] =
      VecIndex.open(spark, d)
        .select(col("vec_id"), col("embedding"), col("norm")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1)
    val rowsBefore = rowSet(dir)

    val cents = VecIndex.retrain(spark, dir, "vec_id", "embedding", k = 4, iters = 3)

    assert(rowSet(dir).sameElements(rowsBefore),
      "retrain changed the vector set — it may only move cells")
    val after = occupancy()
    assert(after.size > 1, s"retrain left all rows in one cell: $after")
    assert(after.values.max < n, "max cell occupancy did not drop")
    // persisted centroids match the returned ones, and search over the
    // re-celled layout still partition-prunes and returns k rows per probe
    val persisted = VecIndex.openCentroids(spark, dir)
      .getOrElse(fail("retrain installed no centroids version")).count()
    assert(persisted == cents.count(), "persisted centroids diverge")
    val idx = VecIndex.open(spark, dir)
    val probes = KMeans
      .assignTop(emb.filter(col("vec_id") < 3), "vec_id", "embedding", cents, 1)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val res = VecIndex.search(idx, probes, "vec_id", "embedding", k = 5)
    val plan = res.queryExecution.executedPlan.toString
    val idxScans = plan.linesIterator.filter(_.contains("/cells")).toSeq
    assert(idxScans.nonEmpty, s"no index scan in plan:\n$plan")
    assert(idxScans.forall(l => l.contains("PartitionFilters: [") &&
      !l.contains("PartitionFilters: []") && l.contains("cid")),
      s"post-retrain search lost partition pruning:\n${idxScans.mkString("\n")}")
    val perProbe = res.groupBy(col("q_id")).count().collect().map(_.getLong(1))
    assert(perProbe.nonEmpty && perProbe.forall(_ == 5L),
      "post-retrain search did not return k rows per probe")
  }

  test("a mutation crash before the manifest rename is invisible; replay converges") {
    import org.apache.hadoop.fs.Path
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("veccrash")
    VecIndex.build(emb, "vec_id", "embedding", cents, dir)
    def rows() =
      VecIndex.open(spark, dir).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    val before = rows()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // forge a retrain/compact killed after writing its COMPLETE next
    // version but before the manifest rename: cells v=2 + centroids v=2
    // + the dot-prefixed manifest temp all exist, but v=1.txt is still
    // the maximum — readers must see the old index fully consistent
    VecIndex.open(spark, dir).withColumn("cid", (col("cid") + 1) % 4)
      .localCheckpoint()
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/cells/v=2")
    emb.limit(3).select(col("vec_id").as("cid"), col("embedding").as("centroid"))
      .write.parquet(s"$dir/centroids/v=2")
    val out = fs.create(new Path(s"$dir/manifest/.tmp-v=2.txt"), true)
    out.write("base:2\nepoch:2\ncents:2\n".getBytes("UTF-8")); out.close()
    assert(rows().sameElements(before), "unpublished version leaked into reads")
    assert(VecIndex.openCentroids(spark, dir).isEmpty,
      "unpublished centroids version leaked")
    // the interrupted mutation simply REPLAYS: the orphan v=2 debris is
    // overwritten and the replayed publish lands
    VecIndex.compact(spark, dir, "vec_id")
    assert(rows().sameElements(before), "replayed compact changed the row set")
    assert(VecIndex.openCentroids(spark, dir).isEmpty,
      "replayed compact installed the aborted retrain's centroid debris")
  }

  test("retrain publishes re-celled rows and new centroids as ONE manifest step") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents0 = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecretrainatomic")
    VecIndex.build(emb, "vec_id", "embedding", cents0, dir)
    val v0 = VecIndex.currentVersion(spark, dir)
    val cents = VecIndex.retrain(spark, dir, "vec_id", "embedding", k = 4, iters = 1)
    // one version advance carries BOTH: the manifest's cells version and
    // centroids version moved together — never new cells with the old
    // quantizer or vice versa
    assert(VecIndex.currentVersion(spark, dir) == v0 + 1)
    val m = VecIndex.currentManifest(spark, dir)
    assert(m.base == m.cents && m.base == v0 + 1,
      s"rows and quantizer published from different versions: $m")
    val persisted = VecIndex.openCentroids(spark, dir).get
      .collect().map(_.toString).sorted
    assert(persisted.sameElements(cents.collect().map(_.toString).sorted))
  }

  test("a reader pinned before maintenance completes unperturbed (graced gc)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecpinned")
    VecIndex.build(emb, "vec_id", "embedding", cents, dir)
    // pin a snapshot, then run the full maintenance battery concurrently:
    // delete + retrain + compact, each publishing a new version. The
    // pinned frame must keep answering from ITS version's files — the
    // LexIndex graced-compaction contract, vector edition (the previous
    // in-place layout forced read-retry here: a reader could observe a
    // missing directory mid-swap)
    val pinned = VecIndex.open(spark, dir)
    val want = pinned.select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    import spark.implicits._
    VecIndex.delete(spark, dir, "vec_id",
      emb.limit(5).select("vec_id"))
    VecIndex.retrain(spark, dir, "vec_id", "embedding", k = 4, iters = 1)
    VecIndex.compact(spark, dir, "vec_id", gcGraceMs = 60L * 60 * 1000)
    val got = pinned.select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.sameElements(want),
      "a concurrent delete/retrain/compact perturbed a pinned reader")
    // the LIVE index moved on (the delete is visible to a fresh open)
    assert(VecIndex.open(spark, dir).count() == want.length - 5L)
    // offline gc (grace 0) collects every superseded version; the live
    // index still reads
    VecIndex.gc(spark, dir)
    assert(VecIndex.open(spark, dir).count() == want.length - 5L)
    val liveDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(liveDirs.length == 1, s"gc left superseded cells versions: ${liveDirs.mkString(",")}")
  }

  test("gc grace ages from SUPERSESSION, not publication mtime") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecgrace")
    VecIndex.build(emb, "vec_id", "embedding", cents, dir)
    // let the v=1 directory's mtime age well past the grace below...
    Thread.sleep(1500)
    // ...then supersede it JUST NOW. A reader could have pinned v=1 a
    // millisecond before this publish — an mtime-aged sweep would
    // delete its files immediately despite the grace.
    VecIndex.compact(spark, dir, "vec_id", gcGraceMs = 1000L)
    val v1 = new java.io.File(s"$dir/cells/v=1")
    assert(v1.isDirectory,
      "graced gc deleted a version superseded a moment ago " +
        "(aged by publication mtime instead of supersession)")
    // once the supersession itself is older than the grace, it goes
    Thread.sleep(1200)
    VecIndex.gc(spark, dir, graceMs = 1000L)
    assert(!v1.exists(), "gc kept a version superseded past the grace")
  }

  test("batch append lands in the delta epoch; containsAny gates a replay") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecbatchappend")
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    VecIndex.build(a, "vec_id", "embedding", cents, dir)
    assert(!VecIndex.containsAny(spark, dir, b.select("vec_id")),
      "containsAny claims unappended ids are present")
    VecIndex.append(b, "vec_id", "embedding", cents, dir)
    assert(VecIndex.containsAny(spark, dir, b.select("vec_id")),
      "containsAny misses appended ids")
    // the appended index row-equals a fresh build over the union
    val unionDir = tempDir("vecbatchappend-union")
    VecIndex.build(emb, "vec_id", "embedding", cents, unionDir)
    def rows(d: String) =
      VecIndex.open(spark, d).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(rows(dir).sameElements(rows(unionDir)),
      "append + build diverges from build over the union")
    // compact folds the delta; rows unchanged, delta share returns to 0
    assert(VecIndex.deltaShare(spark, dir) > 0.0)
    VecIndex.compact(spark, dir, "vec_id")
    assert(rows(dir).sameElements(rows(unionDir)), "compact changed the row set")
    assert(VecIndex.deltaShare(spark, dir) == 0.0)
  }

  test("emptied and zero-row states stay well-defined, not scan failures") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecempty")
    val some = emb.filter(col("vec_id") < 40)
    VecIndex.build(some, "vec_id", "embedding", cents, dir,
      persistCentroids = true)
    // a ZERO-ROW batch append (a day with no candidates) leaves a bare
    // epoch directory — reads must not trip over it
    VecIndex.append(emb.filter(col("vec_id") < 0), "vec_id", "embedding",
      cents, dir)
    assert(VecIndex.open(spark, dir).count() == 40)
    // deleting every vector empties the index: the well-defined empty
    // state (tryOpen None, skew 0, containsAny false), not a
    // schema-less scan failure — and it can be rebuilt
    VecIndex.delete(spark, dir, "vec_id", some.select("vec_id"))
    assert(VecIndex.tryOpen(spark, dir).isEmpty, "emptied index still opens")
    assert(VecIndex.cellSkew(spark, dir) == 0.0)
    assert(!VecIndex.containsAny(spark, dir, Seq(1L).toDF("vec_id")))
    VecIndex.build(some, "vec_id", "embedding", cents, dir)
    assert(VecIndex.open(spark, dir).count() == 40, "rebuild after empty failed")
  }

  test("a stream must not adopt an epoch holding batch-appended files") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecmixguard")
    VecIndex.build(emb.limit(20), "vec_id", "embedding", cents, dir)
    VecIndex.append(emb.limit(40), "vec_id", "embedding", cents, dir)
    // the sink's _spark_metadata log would govern delta/e=1 and silently
    // hide the batch files from every reader — refuse at stream start
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val e = intercept[IllegalArgumentException] {
      VecIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, dir, tempDir("vecmixguard-ckpt"))
    }
    assert(e.getMessage.contains("compact first"), e.getMessage)
    // after the fold the fresh epoch takes a stream cleanly
    VecIndex.compact(spark, dir, "vec_id")
    val q = VecIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, tempDir("vecmixguard-ckpt2"))
    q.stop()
  }

  test("compactIfDelta folds the delta only past the byte-share threshold") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("veccompactpolicy")
    VecIndex.build(emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
      cents, dir)
    VecIndex.append(emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
      cents, dir)
    val share = VecIndex.deltaShare(spark, dir)
    assert(share > 0.0 && share < 1.0, s"fixture share degenerate: $share")
    def rows() =
      VecIndex.open(spark, dir).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    val before = rows()
    val v0 = VecIndex.currentVersion(spark, dir)
    // threshold above the share → measurement only: no new version
    assert(!VecIndex.compactIfDelta(spark, dir, "vec_id",
      maxDeltaShare = share + 0.1))
    assert(VecIndex.currentVersion(spark, dir) == v0,
      "below-threshold policy still published a version")
    // production threshold → the fold runs, reads identical, share -> 0
    assert(VecIndex.compactIfDelta(spark, dir, "vec_id",
      maxDeltaShare = share / 2))
    assert(rows().sameElements(before), "policy compaction changed the row set")
    assert(VecIndex.deltaShare(spark, dir) == 0.0)
    // settled: the policy is a no-op at the same threshold now
    assert(!VecIndex.compactIfDelta(spark, dir, "vec_id",
      maxDeltaShare = share / 2))
  }

  test("post-retrain ANN search floors recall vs brute force on the drift fixture") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = tempDir("vecrecall")
    // the drift fixture: a degenerate day-0 quantizer piles every row
    // into one cell; retrain re-derives centroids from the CURRENT rows.
    // The claim the vector-set/skew specs leave open: the NEW quantizer
    // must also SEARCH well — a retrain that preserved rows but produced
    // badly-pruning centroids would silently gut recall
    val one = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    val degenerate = (0 until 4).map(i => (i, one)).toDF("cid", "centroid")
    VecIndex.build(emb, "vec_id", "embedding", degenerate, dir)
    val cents = VecIndex.retrain(spark, dir, "vec_id", "embedding", k = 4, iters = 3)
    val k = 10
    val nprobe = 2
    val probeIds = (0 until 20).map(_ * 7L) // a spread of probe vectors
    val probeSet = emb.filter(col("vec_id").isin(probeIds: _*))
    val probes = KMeans
      .assignTop(probeSet, "vec_id", "embedding", cents, nprobe)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    val ann = VecIndex.search(VecIndex.open(spark, dir), probes,
        "vec_id", "embedding", k)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: exact cosine top-k over the WHOLE corpus per probe
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val exact = probeSet
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .crossJoin(emb.select(col("vec_id"), col("embedding")))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        call_function("float_dot", col("embedding"), col("q_vec")) /
          (sqrt(call_function("float_dot", col("embedding"), col("embedding"))) *
            sqrt(call_function("float_dot", col("q_vec"), col("q_vec")))))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    info(f"post-retrain recall@$k (nprobe=$nprobe): $recall%.2f")
    assert(recall >= 0.6,
      f"post-retrain ANN recall $recall%.2f below the 0.6 floor — " +
        "the retrained quantizer prunes badly")
  }

  test("maintainIfSkewed retrains only past the skew threshold") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = tempDir("vecmaint")
    // the retrain fixture's degenerate quantizer: every row lands in
    // cell 0, skew = 1.0
    val one = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    val degenerate = (0 until 4).map(i => (i, one)).toDF("cid", "centroid")
    VecIndex.build(emb, "vec_id", "embedding", degenerate, dir)
    assert(VecIndex.cellSkew(spark, dir) === 1.0)
    // a threshold the degenerate skew does not exceed → measurement only:
    // no retrain means no re-cell and no installed quantizer (retrain is
    // what first publishes a centroids version)
    assert(!VecIndex.maintainIfSkewed(spark, dir, "vec_id", "embedding",
      k = 4, maxCellShare = 1.0))
    assert(VecIndex.cellSkew(spark, dir) === 1.0,
      "below-threshold maintenance still re-celled the index")
    assert(VecIndex.openCentroids(spark, dir).isEmpty,
      "below-threshold maintenance still installed a quantizer")
    // production threshold → retrain runs and the skew actually drops
    assert(VecIndex.maintainIfSkewed(spark, dir, "vec_id", "embedding",
      k = 4, maxCellShare = 0.5, iters = 3))
    val after = VecIndex.cellSkew(spark, dir)
    assert(after < 1.0 && after <= 0.5 + 0.35,
      s"post-retrain skew did not drop meaningfully: $after")
    // settled: a second policy pass is a no-op at the same threshold
    // unless the corpus is genuinely unbalanceable at this k
    if (after <= 0.5)
      assert(!VecIndex.maintainIfSkewed(spark, dir, "vec_id", "embedding",
        k = 4, maxCellShare = 0.5))
  }

  test("maintenance ops fail fast while another writer holds the index lease") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecfence")
    VecIndex.build(emb, "vec_id", "embedding", cents, dir)
    def rows() =
      VecIndex.open(spark, dir).select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    val before = rows()
    val held = Lease.acquire(spark, dir, "concurrent-writer")
    try {
      for ((label, op) <- Seq[(String, () => Unit)](
        ("build", () => VecIndex.build(emb, "vec_id", "embedding", cents, dir)),
        ("compact", () => VecIndex.compact(spark, dir, "vec_id")),
        ("delete", () => VecIndex.delete(spark, dir, "vec_id",
          Seq(before.head._1).toDF("vec_id"))),
        ("retrain", () => VecIndex.retrain(spark, dir, "vec_id",
          "embedding", k = 4, iters = 1)))) {
        val e = intercept[IllegalStateException](op())
        assert(e.getMessage.contains("concurrent-writer"),
          s"$label did not name the live holder: ${e.getMessage}")
      }
    } finally Lease.release(spark, held)
    assert(rows().sameElements(before),
      "a fenced-out maintenance op still changed the index")
    VecIndex.compact(spark, dir, "vec_id") // writable again after release
    assert(rows().sameElements(before))
  }

  test("a live append stream fails loudly when a concurrent compact retires its epoch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
      .localCheckpoint()
    val dir = tempDir("vecfence")
    VecIndex.build(emb.limit(20), "vec_id", "embedding", cents, dir)
    val batch = emb.filter(col("vec_id") >= 20).limit(16)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = VecIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, tempDir("vecfence-ckpt"))
    try {
      input.addData(batch.take(8))
      q.processAllAvailable()
      assert(VecIndex.open(spark, dir).count() == 28)
      // concurrent maintenance folds the delta and bumps the epoch —
      // the stream's directory is retired under it
      VecIndex.compact(spark, dir, "vec_id", gcGraceMs = 60L * 60 * 1000)
      input.addData(batch.drop(8))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): String =
        if (t == null) "" else t.toString + "\n" + chain(t.getCause)
      assert(chain(e).contains("superseded"),
        s"fence did not name the retirement:\n${chain(e)}")
      // the failed batch landed NOTHING a reader could miss: the live
      // index still serves exactly the pre-failure rows
      assert(VecIndex.open(spark, dir).count() == 28,
        "a fenced batch leaked rows into the live index")
    } finally q.stop()
    // the operator's documented recovery: restart against the current
    // epoch with a fresh checkpoint — the remaining arrivals land
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q2 = VecIndex.appendStream(input2.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, tempDir("vecfence-ckpt2"))
    try {
      input2.addData(batch.drop(8))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(VecIndex.open(spark, dir).count() == 36,
      "restarted stream did not land the remaining arrivals")
  }

  test("a quantizer swap cannot strand delta rows: build refuses a live delta, the stream fence stops an empty-delta swap") {
    // TWO layers close the window: rows ALREADY landed in the delta are
    // protected by build itself (a different-quantizer install over a
    // live delta is refused — the per-batch fence can only stop FUTURE
    // batches, and a later compact would fossilize the stale cids with
    // no repair path); rows NOT yet landed are protected by the
    // per-batch fence checking BOTH manifest coordinates, because the
    // epoch SURVIVES a persistCentroids build (only cents moves — an
    // epoch-only fence would stay silent, the PqIndex sibling's
    // discipline).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
      .localCheckpoint()
    val cents2 = KMeans.lloyd(emb, "vec_id", "embedding", k = 3, iters = 2)
      .localCheckpoint()
    val dir = tempDir("veccentsfence")
    VecIndex.build(emb.limit(20), "vec_id", "embedding", cents, dir,
      persistCentroids = true)
    val batch = emb.filter(col("vec_id") >= 20).limit(16)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = VecIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, tempDir("veccentsfence-ckpt"))
    try {
      input.addData(batch.take(8))
      q.processAllAvailable()
      // layer 1: the delta holds the stream's rows — a swap is refused
      val eBuild = intercept[IllegalArgumentException] {
        VecIndex.build(emb.limit(20), "vec_id", "embedding", cents2, dir,
          persistCentroids = true)
      }
      assert(eBuild.getMessage.contains("live delta"), eBuild.getMessage)
      // a CONTENT-EQUAL re-install (interrupted-build replay) stays legal
      VecIndex.build(emb.limit(20), "vec_id", "embedding", cents, dir,
        persistCentroids = true)
      // compact retires the delta; the stream dies on its epoch fence
      VecIndex.compact(spark, dir, "vec_id", gcGraceMs = 60L * 60 * 1000)
      input.addData(batch.slice(8, 12))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
    // layer 2: fresh stream over the EMPTY post-compact delta; the swap
    // is now legal (no rows to strand) and the next batch must die on
    // the cents coordinate, epoch unchanged
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q2 = VecIndex.appendStream(input2.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, tempDir("veccentsfence-ckpt2"))
    try {
      VecIndex.build(emb.limit(20), "vec_id", "embedding", cents2, dir,
        persistCentroids = true)
      input2.addData(batch.drop(12))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def chain(t: Throwable): String =
        if (t == null) "" else t.toString + "\n" + chain(t.getCause)
      assert(chain(e).contains("superseded"),
        s"cents-swap fence silent:\n${chain(e)}")
      // nothing landed into the live delta under the stale layout
      assert(VecIndex.open(spark, dir).count() == 20,
        "a fenced batch leaked rows celled under a retired quantizer")
    } finally q2.stop()
  }

  test("a fresh checkpoint refuses an epoch already holding another lineage's batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
      .localCheckpoint()
    val dir = tempDir("veclineage")
    val ckpt = tempDir("veclineage-ckpt")
    val batch = emb.limit(16).select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = VecIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, ckpt)
    try { input.addData(batch.take(8)); q.processAllAvailable() } finally q.stop()
    // a NEW lineage (fresh checkpoint) would restart batch numbering at
    // 0 and overwrite b=0 — refused at start
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val e = intercept[IllegalArgumentException] {
      VecIndex.appendStream(input2.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, dir, tempDir("veclineage-ckpt-fresh"))
    }
    assert(e.getMessage.contains("resume the original checkpoint"), e.getMessage)
    // resuming the ORIGINAL checkpoint continues the lineage cleanly —
    // the source replays its retained blocks (block 0 is already
    // committed and is never re-read; block 1 lands as the next batch)
    val input3 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    input3.addData(batch.take(8))
    val q3 = VecIndex.appendStream(input3.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, ckpt)
    try { input3.addData(batch.drop(8)); q3.processAllAvailable() } finally q3.stop()
    val ids = VecIndex.open(spark, dir).select(col("vec_id")).collect()
      .map(_.getLong(0)).sorted
    assert(ids.length == 16 && ids.distinct.length == 16,
      s"resumed lineage lost or duplicated rows: ${ids.length}")
  }

  test("pinned view pairs centroids with cells across a concurrent retrain") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val dir = tempDir("vecpinned")
    VecIndex.build(emb, "vec_id", "embedding", cents, dir,
      persistCentroids = true)
    val pin = VecIndex.pinned(spark, dir)
    def cellsOf(df: org.apache.spark.sql.DataFrame): Array[(Long, Int)] =
      df.select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
    val rowsBefore = cellsOf(pin.index)
    val centsBefore = pin.centroids.get.collect().map(_.toString).sorted
    // retrain with a DIFFERENT k: new quantizer + re-celled rows publish
    // in one rename; no gc runs, so the pinned version's files survive
    VecIndex.retrain(spark, dir, "vec_id", "embedding", k = 7, iters = 1)
    // the pinned view still serves the ORIGINAL matched pair — assigning
    // probes with its centroids against its cells can never mix versions
    assert(pin.centroids.get.collect().map(_.toString).sorted
      .sameElements(centsBefore),
      "pinned centroids drifted to the retrained quantizer")
    assert(cellsOf(pin.index).sameElements(rowsBefore),
      "pinned index rows drifted to the re-celled layout")
    assert(pin.centroids.get.count() == 4L)
    // a FRESH pin sees the new matched pair
    val fresh = VecIndex.pinned(spark, dir)
    assert(fresh.centroids.get.count() == 7L,
      "fresh pin did not pick up the retrained quantizer")
    assert(fresh.index.select(col("cid")).distinct().count() <= 7L)
    // and the fresh pair is self-consistent: every row's cid is a cell
    // of the fresh quantizer
    val freshCells = fresh.centroids.get.select(col("cid"))
      .collect().map(_.getInt(0)).toSet
    assert(cellsOf(fresh.index).map(_._2).forall(freshCells.contains),
      "fresh pinned rows reference cells outside the fresh quantizer")
  }

  test("a micro-batch waits out a concurrently held index lease instead of dying") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
      .localCheckpoint()
    val dir = tempDir("vecwait")
    VecIndex.build(emb.limit(20), "vec_id", "embedding", cents, dir)
    val batch = emb.filter(col("vec_id") >= 20).limit(8)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    // a maintenance pass holds the index lease while the batch fires:
    // the fence's bounded-patience acquire WAITS it out (a fail-fast
    // acquire killed the stream here), then the epoch check passes —
    // nothing retired — and the batch lands
    val held = Lease.acquire(spark, dir, "maintenance-pass")
    val releaser = new Thread(() => {
      Thread.sleep(1500); Lease.release(spark, held)
    })
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = VecIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dir, tempDir("vecwait-ckpt"))
    try {
      input.addData(batch.toIndexedSeq)
      releaser.start()
      q.processAllAvailable()
      assert(VecIndex.open(spark, dir).count() == 28,
        "the waited-out batch did not land")
    } finally { q.stop(); releaser.join() }
  }

  test("retrain publishes a contiguous quantizer even when lloyd drops an emptied cell") {
    import spark.implicits._
    // ids 0 and 1 carry the SAME vector: init seeds two identical
    // centroids, every row's cosine ties between them and breaks toward
    // the lower cid, the duplicate's cell empties in round 1, and
    // lloyd's per-cell mean silently drops it — the raw trainer output
    // is GAPPED
    val vecs = (0L to 15L).map { i =>
      val v = if (i <= 1L) Seq(1f, 0f, 0f, 0f)
        else Seq((i % 4).toFloat + 1f, (i % 3).toFloat, 1f, 0.5f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val raw = KMeans.lloyd(vecs, "vec_id", "embedding", k = 4, iters = 2)
    assert(raw.select(col("cid")).collect().map(_.getInt(0)).sorted
      .sameElements(Array(0, 2, 3)),
      "fixture vacuous: lloyd kept every cell")
    val dir = tempDir("vecgap")
    VecIndex.build(vecs, "vec_id", "embedding",
      KMeans.contiguous(raw).localCheckpoint(), dir, persistCentroids = true)
    // the retrain re-runs lloyd over the same degenerate rows — before
    // the renumber it published the gapped set, and every POSITIONAL
    // consumer downstream (PqIndex.quantFrom's g_cents row) hard-fails
    // on gaps: a PQ-paired driver's maintenance would wedge forever
    VecIndex.retrain(spark, dir, "vec_id", "embedding", k = 4, iters = 2)
    val cents = VecIndex.openCentroids(spark, dir).get.localCheckpoint()
    val cids = cents.select(col("cid")).collect().map(_.getInt(0)).sorted
    assert(cids.sameElements(Array.range(0, cids.length)),
      s"retrain published gapped cids: ${cids.mkString(",")}")
    // and the positional consumer accepts the published quantizer
    val assigned = VecIndex.assignFold(vecs, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("embedding"), col("cid"))
    assert(PqIndex.quantFrom(cents, assigned, "vec_id", "embedding",
      m = 2, k = 4, iters = 1).count() == 1L)
  }
}
