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
}
