package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ index's contracts: search over the stored code
  * table is row-identical to q95's inline IVFADC plan under the same
  * quantizer, the scan partition-prunes to the probed cells, the
  * append/compact LSM path converges to a fresh build, retraction
  * works, and pinned readers survive graced maintenance — the VecIndex
  * contract suite, code-table edition.
  */
class PqIndexSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val nc = 16 // q95's coarse cell count
  private val m = 8
  private val dsub = 8

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** q95's quantizer, via the SHARED definition the inline row and
    * q134's persisted row use — the spec must exercise the production
    * quantizer, not its own copy that could drift. */
  private lazy val quant: DataFrame =
    graft.queries.CurationQ3.ivfpqQuant(spark, sf).localCheckpoint()

  private def probes: DataFrame = emb
    .filter(col("vec_id") >= nc && col("vec_id") < nc + 8)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def rows(df: DataFrame): Array[(Long, Int, Long, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getInt(3), r.getDouble(4))).sorted

  test("search over the persisted code table equals q95's inline IVFADC plan") {
    val dir = tempDir("pqidx")
    PqIndex.build(emb, "vec_id", "embedding", quant, dir)
    val got = rows(PqIndex.search(spark, dir, probes, "vec_id",
      k = 10, nprobe = 2))
    val want = rows(graft.queries.Registry
      .byName("q95_ivfpq_ann").run(spark, sf))
    assert(got.length == want.length && got.nonEmpty,
      s"result sizes differ: ${got.length} vs ${want.length}")
    assert(got.sameElements(want),
      "persisted-index ADC search diverged from the inline q95 plan")
    // and the code scan partition-prunes to the probed cells
    val plan = PqIndex.search(spark, dir, probes, "vec_id", 10, 2)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("/cells")).toSeq
    assert(scans.nonEmpty, s"no code-table scan in plan:\n$plan")
    assert(scans.forall(l => l.contains("PartitionFilters: [") &&
      !l.contains("PartitionFilters: []") && l.contains("cid")),
      s"code scan not pruned on cid:\n${scans.mkString("\n")}")
  }

  test("append + compact converge to the fresh build; policy gates the fold") {
    val dir = tempDir("pqidx-lsm")
    val fullDir = tempDir("pqidx-full")
    val day0 = emb.filter(col("vec_id") % 3 =!= 0)
    val day1 = emb.filter(col("vec_id") % 3 === 0)
    PqIndex.build(day0, "vec_id", "embedding", quant, dir)
    assert(!PqIndex.containsAny(spark, dir, day1.select("vec_id")))
    PqIndex.append(day1, "vec_id", "embedding", dir)
    assert(PqIndex.containsAny(spark, dir, day1.select("vec_id")))
    PqIndex.build(emb, "vec_id", "embedding", quant, fullDir)
    def codeRows(p: String) = PqIndex.open(spark, p)
      .select(col("vec_id"), col("cid"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    assert(codeRows(dir).sameElements(codeRows(fullDir)),
      "append path diverged from the fresh build")
    val share = PqIndex.deltaShare(spark, dir)
    assert(share > 0.0 && share < 1.0, s"degenerate share $share")
    assert(!PqIndex.compactIfDelta(spark, dir, "vec_id",
      maxDeltaShare = share + 0.1), "below-threshold policy folded")
    assert(PqIndex.compactIfDelta(spark, dir, "vec_id",
      maxDeltaShare = share / 2))
    assert(codeRows(dir).sameElements(codeRows(fullDir)),
      "compaction changed the code table")
    assert(PqIndex.deltaShare(spark, dir) == 0.0)
    // searches identical through the whole LSM lifecycle
    assert(rows(PqIndex.search(spark, dir, probes, "vec_id", 10, 2))
      .sameElements(rows(PqIndex.search(spark, fullDir, probes, "vec_id", 10, 2))))
  }

  test("searchAssigned with the index's own coarse cells equals search") {
    import org.apache.spark.sql.expressions.Window
    val dir = tempDir("pqidx-sa")
    PqIndex.build(emb, "vec_id", "embedding", quant, dir)
    // reproduce search's own coarse cell selection (top-nprobe by the
    // coarse dtab) externally, then hand it in as the assignment
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("qc_d2").asc, col("q_cid").asc)
    val assignedProbes = probes.crossJoin(broadcast(quant))
      .select(col("q_id"), col("q_vec"),
        posexplode(element_at(call_function("pq_dtab", col("q_vec"),
          col("g_cents"), col("g_ccs")), 1)).as(Seq("q_cid", "qc_d2")))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= 2)
      .select(col("q_id"), col("q_vec"), col("q_cid"))
    val got = rows(PqIndex.searchAssigned(spark, dir, assignedProbes,
      "vec_id", k = 10))
    val want = rows(PqIndex.search(spark, dir, probes, "vec_id",
      k = 10, nprobe = 2))
    assert(got.nonEmpty && got.sameElements(want),
      "externally-assigned ADC search diverged from the self-assigned path")
  }

  test("assigned IVFADC stack: full-depth ADC + exact rerank equals VecIndex.search") {
    // ONE cosine cell layout shared by the code table and a raw-vector
    // VecIndex (the driver's production stack): candidates from the PQ
    // table at full depth, exact-cosine rerank against the raw cells —
    // bitwise the exact path; at bounded depth, a recall floor.
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        col("embedding").as("centroid")).localCheckpoint()
    val corpus = emb.filter(col("vec_id") >= nc + 8)
    val day0 = corpus.filter(col("vec_id") % 3 =!= 0)
    val day1 = corpus.filter(col("vec_id") % 3 === 0)
    def assignOf(df: org.apache.spark.sql.DataFrame) =
      VecIndex.assignFold(df, "vec_id", "embedding", cents)
        .select(col("vec_id"), col("embedding"), col("cid"))
    val q = PqIndex.quantFrom(cents, assignOf(corpus), "vec_id", "embedding",
      m, k = 16, iters = 1).localCheckpoint()
    val pqDir = tempDir("pqidx-stack-pq")
    PqIndex.buildAssigned(assignOf(day0), "vec_id", "embedding", q, pqDir)
    PqIndex.appendAssigned(assignOf(day1), "vec_id", "embedding", pqDir)
    // the stored layout IS the external assignment
    val storedCids = PqIndex.open(spark, pqDir)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val wantCids = assignOf(corpus).select(col("vec_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(storedCids.sameElements(wantCids),
      "assigned mutators did not store the external cell layout")
    val vecDir = tempDir("pqidx-stack-vec")
    VecIndex.build(corpus, "vec_id", "embedding", cents, vecDir)
    val pr = KMeans.assignTop(
        probes.select(col("q_id").as("vec_id"), col("q_vec").as("embedding")),
        "vec_id", "embedding", cents, 2)
      .join(probes.select(col("q_id"), col("q_vec")),
        col("vec_id") === col("q_id"))
      .select(col("q_id"), col("q_vec"), col("cid").as("q_cid"))
    val idx = VecIndex.open(spark, vecDir)
    val want = VecIndex.search(idx, pr, "vec_id", "embedding", 10)
      .collect().map(_.toString).sorted
    val candFull = PqIndex.searchAssigned(spark, pqDir, pr, "vec_id",
        k = Int.MaxValue)
      .select(col("q_id"), col("vec_id"))
    val gotFull = VecIndex.rerank(idx, pr, candFull, "vec_id", "embedding", 10)
      .collect().map(_.toString).sorted
    assert(gotFull.nonEmpty && gotFull.sameElements(want),
      "full-depth ADC + exact rerank diverged from the exact path")
    // bounded candidate depth: recall floor vs the exact top-10
    val cand32 = PqIndex.searchAssigned(spark, pqDir, pr, "vec_id", k = 32)
      .select(col("q_id"), col("vec_id"))
    val got32 = VecIndex.rerank(idx, pr, cand32, "vec_id", "embedding", 10)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantPairs = VecIndex.search(idx, pr, "vec_id", "embedding", 10)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got32.intersect(wantPairs).size.toDouble / wantPairs.size
    assert(recall >= 0.5, s"depth-32 reranked recall $recall below floor")
  }

  test("refresh re-encodes under the new quantizer and retires the stale delta") {
    val dir = tempDir("pqidx-refresh")
    val day0 = emb.filter(col("vec_id") % 3 =!= 0)
    val day1 = emb.filter(col("vec_id") % 3 === 0)
    PqIndex.build(day0, "vec_id", "embedding", quant, dir)
    PqIndex.append(day1, "vec_id", "embedding", dir)
    val before = Versioned.current(spark, dir)
    assert(PqIndex.deltaShare(spark, dir) > 0.0, "fixture vacuous: no delta")
    val pinned = PqIndex.open(spark, dir)
    val nAll = pinned.count()
    // a DIFFERENT quantizer: 8 coarse cells off the first 8 vectors
    val cents8 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid"))
    val assigned = emb.crossJoin(broadcast(quant)) // any assignment works for training
      .select(col("vec_id"), col("embedding"),
        (col("vec_id") % 8).cast("int").as("cid"))
    val quantB = PqIndex.quantFrom(cents8, assigned, "vec_id", "embedding",
      m, k = 16, iters = 1).localCheckpoint()
    PqIndex.refresh(emb, "vec_id", "embedding", quantB, dir,
      gcGraceMs = 60L * 60 * 1000)
    val after = Versioned.current(spark, dir)
    assert(after.epoch == before.epoch + 1L,
      "refresh did not retire the stale-quantizer delta epoch")
    assert(after.cents == after.base && after.cents > before.cents,
      "refresh did not publish the codes with their quantizer")
    // the published table equals a fresh self-assigned build under B
    val fresh = tempDir("pqidx-refresh-fresh")
    PqIndex.build(emb, "vec_id", "embedding", quantB, fresh)
    def codeRows(p: String) = PqIndex.open(spark, p)
      .select(col("vec_id"), col("cid"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    assert(codeRows(dir).sameElements(codeRows(fresh)),
      "refreshed table diverged from a fresh build under the new quantizer")
    assert(PqIndex.deltaShare(spark, dir) == 0.0,
      "stale delta still counted after refresh")
    // the graced gc kept the pinned reader's matched old pair alive
    assert(pinned.count() == nAll,
      "refresh perturbed a pinned pre-refresh reader")
  }

  test("refreshIfSkewed is measurement-only below threshold, re-encodes above") {
    val dir = tempDir("pqidx-policy")
    PqIndex.build(emb, "vec_id", "embedding", quant, dir)
    val v0 = PqIndex.currentVersion(spark, dir)
    val skew = PqIndex.cellSkew(spark, dir)
    assert(skew > 0.0 && skew < 1.0, s"degenerate fixture skew $skew")
    // below threshold: no refresh AND the quantizer thunk never runs
    assert(!PqIndex.refreshIfSkewed(emb, "vec_id", "embedding", dir,
      maxCellShare = skew + 0.05) {
      fail("below-threshold policy evaluated the quantizer"); quant
    })
    assert(PqIndex.currentVersion(spark, dir) == v0,
      "measurement-only pass published a version")
    // above threshold: the gated re-encode runs with the new quantizer
    val cents8 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid"))
    val assigned = emb.select(col("vec_id"), col("embedding"),
      (col("vec_id") % 8).cast("int").as("cid"))
    assert(PqIndex.refreshIfSkewed(emb, "vec_id", "embedding", dir,
      maxCellShare = skew / 2) {
      PqIndex.quantFrom(cents8, assigned, "vec_id", "embedding", m, 16, 1)
    })
    assert(PqIndex.currentVersion(spark, dir) > v0, "gated refresh did not publish")
    assert(PqIndex.open(spark, dir).count() == emb.count())
  }

  test("appendStream equals batch append; both epoch directions guarded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day0 = emb.filter(col("vec_id") % 3 =!= 0)
    val day1 = emb.filter(col("vec_id") % 3 === 0)
    val streamed = tempDir("pqidx-stream")
    val batched = tempDir("pqidx-stream-ref")
    PqIndex.build(day0, "vec_id", "embedding", quant, streamed)
    PqIndex.build(day0, "vec_id", "embedding", quant, batched)
    PqIndex.append(day1, "vec_id", "embedding", batched)
    val rows1 = day1.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = PqIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", streamed, tempDir("pqidx-stream-ckpt"))
    try {
      rows1.grouped(math.max(1, rows1.length / 3 + 1)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()
    def codeRows(p: String) = PqIndex.open(spark, p)
      .select(col("vec_id"), col("cid"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    assert(codeRows(streamed).nonEmpty &&
      codeRows(streamed).sameElements(codeRows(batched)),
      "streamed code table diverged from the batch-appended one")
    // one discipline per epoch, both directions
    val eBatch = intercept[IllegalArgumentException] {
      PqIndex.append(day1, "vec_id", "embedding", streamed)
    }
    assert(eBatch.getMessage.contains("stream lineage"), eBatch.getMessage)
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val eFresh = intercept[IllegalArgumentException] {
      PqIndex.appendStream(input2.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", streamed, tempDir("pqidx-stream-ckpt-fresh"))
    }
    assert(eFresh.getMessage.contains("resume the original checkpoint"),
      eFresh.getMessage)
    val eStream = intercept[IllegalArgumentException] {
      PqIndex.appendStream(input2.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", batched, tempDir("pqidx-stream-ckpt2"))
    }
    assert(eStream.getMessage.contains("batch-appended"), eStream.getMessage)
  }

  test("a live append stream fails loudly when its quantizer is superseded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("pqidx-qfence")
    val day0 = emb.filter(col("vec_id") % 3 =!= 0)
    PqIndex.build(day0, "vec_id", "embedding", quant, dir)
    val rows1 = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = PqIndex.appendStream(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, tempDir("pqidx-qfence-ckpt"))
    try {
      input.addData(rows1.take(4)); q.processAllAvailable()
      val n0 = PqIndex.open(spark, dir).count()
      // a rebuild that SWAPS the quantizer over this live delta is
      // refused outright — the epoch's codes belong to the pinned row
      val cents8 = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid"))
      val quantB = PqIndex.quantFrom(cents8,
        emb.select(col("vec_id"), col("embedding"),
          (col("vec_id") % 8).cast("int").as("cid")),
        "vec_id", "embedding", m, 16, 1).localCheckpoint()
      val eBuild = intercept[IllegalArgumentException] {
        PqIndex.build(day0, "vec_id", "embedding", quantB, dir)
      }
      assert(eBuild.getMessage.contains("use refresh"), eBuild.getMessage)
      assert(PqIndex.open(spark, dir).count() == n0,
        "refused rebuild mutated the table")
      // a rebuild under the SAME quantizer content passes the guard but
      // still supersedes the pinned manifest (new cents version) — the
      // per-batch fence must catch the quantizer coordinate ALONE (the
      // epoch is unchanged by build)
      PqIndex.build(day0, "vec_id", "embedding", quant, dir)
      input.addData(rows1.drop(4))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): String =
        if (t == null) "" else t.toString + "\n" + chain(t.getCause)
      assert(chain(e).contains("superseded"), s"fence silent:\n${chain(e)}")
    } finally q.stop()
  }

  test("quantFrom rejects a gapped coarse cid set") {
    import spark.implicits._
    val coarse = emb.filter(col("vec_id") === 0 || col("vec_id") === 2)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid"))
    val assigned = emb.limit(32).select(col("vec_id"), col("embedding"),
      lit(0).cast("int").as("cid"))
    val e = intercept[IllegalArgumentException] {
      PqIndex.quantFrom(coarse, assigned, "vec_id", "embedding", m, 4, 0)
    }
    assert(e.getMessage.contains("contiguous"), e.getMessage)
    // duplicates satisfy the min/max/count bounds only together with a
    // gap — a duplicated row alone must also fail (positional shift)
    val dup = emb.filter(col("vec_id") < 4)
      .select(when(col("vec_id") === 3, lit(1)).otherwise(col("vec_id"))
        .cast("int").as("cid"), col("embedding").as("centroid"))
      .unionByName(emb.filter(col("vec_id") === 0)
        .select(lit(3).cast("int").as("cid"), col("embedding").as("centroid")))
    val e2 = intercept[IllegalArgumentException] {
      PqIndex.quantFrom(dup, assigned, "vec_id", "embedding", m, 4, 0)
    }
    assert(e2.getMessage.contains("duplicate-free"), e2.getMessage)
  }

  test("delete retracts ids; pinned readers survive graced maintenance") {
    import spark.implicits._
    val dir = tempDir("pqidx-del")
    PqIndex.build(emb, "vec_id", "embedding", quant, dir)
    val n0 = PqIndex.open(spark, dir).count()
    val pinned = PqIndex.open(spark, dir)
    PqIndex.delete(spark, dir, "vec_id",
      emb.limit(5).select("vec_id"))
    PqIndex.compact(spark, dir, "vec_id", gcGraceMs = 60L * 60 * 1000)
    assert(pinned.count() == n0,
      "concurrent delete/compact perturbed a pinned reader")
    assert(PqIndex.open(spark, dir).count() == n0 - 5)
    // absent ids are no-ops; offline gc leaves one live version
    PqIndex.delete(spark, dir, "vec_id", Seq(-1L).toDF("vec_id"))
    assert(PqIndex.open(spark, dir).count() == n0 - 5)
    PqIndex.gc(spark, dir)
    assert(PqIndex.open(spark, dir).count() == n0 - 5)
    val liveDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(liveDirs.length == 1, s"gc left versions: ${liveDirs.mkString(",")}")
  }

  test("delete is cell-pruned: victim cells rewritten, the rest referenced through the sidecar") {
    import spark.implicits._
    val dir = tempDir("pqidx-delprune")
    PqIndex.build(emb, "vec_id", "embedding", quant, dir)
    def cidDirs(v: Long): Seq[String] = {
      val d = new java.io.File(s"$dir/cells/v=$v")
      if (!d.exists) Seq.empty
      else d.listFiles.filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith("cid=")).toSeq.sorted
    }
    val all0 = PqIndex.open(spark, dir).select(col("vec_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(cidDirs(1).size > 1, "fixture vacuous: fewer than 2 cells")
    val (vid, vcid) = all0.head
    PqIndex.delete(spark, dir, "vec_id", Seq(vid).toDF("vec_id"))
    assert(cidDirs(2) == Seq(s"cid=$vcid"),
      s"pruned delete rewrote more than the victim's cell: ${cidDirs(2)}")
    val want = all0.filterNot(_._1 == vid)
    assert(PqIndex.open(spark, dir).select(col("vec_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      .sameElements(want), "pruned delete lost or kept wrong rows")
    // the referenced previous version survives zero-grace gc
    PqIndex.gc(spark, dir, 0L)
    assert(cidDirs(1).nonEmpty, "gc deleted a chain-referenced version")
    // searchAssigned over the chained table still answers (and prunes)
    val probes = emb.join(
        PqIndex.open(spark, dir).select(col("vec_id"), col("cid")),
        Seq("vec_id")).limit(2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid").as("q_cid"))
    assert(PqIndex.searchAssigned(spark, dir, probes, "vec_id", 5)
      .count() > 0L, "search over a pruned-delete chain returned nothing")
  }
}
