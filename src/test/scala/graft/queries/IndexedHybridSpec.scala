package graft.queries

import graft.SparkSpecBase

/** q121's contract: the index-backed hybrid retrieval plan must
  * partition-prune on BOTH candidate scans (the point of being
  * index-backed — a recurring retrieval workload reads the query
  * terms' buckets and the probes' cells, never the corpus), and its
  * fused result must track the brute-force q113 fusion, which stays
  * registered as the recall oracle (the q72 pattern).
  *
  * The floor: the lexical side is EXACT (LexIndexSpec proves search ≡
  * the inline scorer), so every divergence comes from the vector
  * side's IVF approximation (nprobe = 2 of 16 cells) re-ordering the
  * fusion. Measured fused top-5 overlap at sf0.001: 20/30 ≈ 0.67 —
  * floored at 0.6 so an approximation regression (probe depth, cell
  * assignment, fusion arithmetic) is loud without pinning the
  * corpus-dependent exact value.
  */
class IndexedHybridSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("both index scans partition-prune (lex buckets on tb, vec cells on cid)") {
    val plan = Registry.byName("q121_indexed_hybrid").run(spark, sf)
      .queryExecution.executedPlan.toString
    val lexScans = plan.linesIterator.filter(_.contains("/lex/buckets")).toSeq
    assert(lexScans.nonEmpty, s"no LexIndex bucket scan in plan:\n$plan")
    assert(lexScans.forall(l => l.contains("PartitionFilters: [") && l.contains("tb")),
      s"LexIndex scan not pruned on tb:\n${lexScans.mkString("\n")}")
    val vecScans = plan.linesIterator.filter(_.contains("/vec/cells")).toSeq
    assert(vecScans.nonEmpty, s"no VecIndex cell scan in plan:\n$plan")
    assert(vecScans.forall(l => l.contains("PartitionFilters: [") && l.contains("cid")),
      s"VecIndex scan not pruned on cid:\n${vecScans.mkString("\n")}")
  }

  test("q132 (search-only row) matches q121 exactly and reuses the cached build") {
    def rows(name: String): Array[String] =
      Registry.byName(name).run(spark, sf).collect().map(_.toString).sorted
    val q121 = rows("q121_indexed_hybrid")
    val first = rows("q132_indexed_search") // builds the cache (or reuses)
    assert(first.sameElements(q121), "q132 diverged from q121 on the same corpus")
    // the cached root must not be rebuilt by a second invocation —
    // compare the recursive max mtime under the only shared_* root
    val roots = new java.io.File("target/qindex").listFiles()
      .filter(_.getName.startsWith("shared_"))
    assert(roots.nonEmpty, "q132 left no cached index root")
    def maxMtime(f: java.io.File): Long = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
      (f.lastModified() +: kids.map(maxMtime)).max
    }
    val before = roots.map(maxMtime).max
    val second = rows("q132_indexed_search")
    assert(second.sameElements(q121), "second q132 run diverged")
    assert(roots.map(maxMtime).max == before,
      "second q132 run rewrote the cached index — the build is not reused")
    // and the search-only plan still partition-prunes both scans (plan
    // printed over a SHORT root — q132's cached root is long enough that
    // the FileScan location truncates out of the plan string)
    val shortRoot = tempDir("hyb")
    CurationQ7.buildHybridIndexes(spark, sf, shortRoot)
    val plan = CurationQ7.searchHybridIndexes(spark, sf, shortRoot)
      .queryExecution.executedPlan.toString
    val lexScans = plan.linesIterator.filter(_.contains("/lex/buckets")).toSeq
    assert(lexScans.nonEmpty && lexScans.forall(l =>
      l.contains("PartitionFilters: [") && l.contains("tb")),
      s"q132 LexIndex scan not pruned on tb:\n${lexScans.mkString("\n")}")
    val vecScans = plan.linesIterator.filter(_.contains("/vec/cells")).toSeq
    assert(vecScans.nonEmpty && vecScans.forall(l =>
      l.contains("PartitionFilters: [") && l.contains("cid")),
      s"q132 VecIndex scan not pruned on cid:\n${vecScans.mkString("\n")}")
  }

  test("cache families lease per ROOT: one family's build never blocks another") {
    // forge an in-flight build of one cache family by holding ITS root's
    // lock-dir lease; resolving an UNRELATED family's root must not
    // queue behind it (the shared-parent-lease regression: a waiter
    // timed out with a spurious 'never published' while a different
    // family built). Tag names mirror production; roots are this test's.
    import graft.operators.Lease
    import org.apache.hadoop.fs.Path
    val fs = new Path("target/qindex")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // locate the pq-family lock dir the way cachedRoot names it: resolve
    // a pq root first so its name (fingerprint included) is known
    val pqRoot = CurationQ7.cachedRoot(spark, sf, "pqtest")(tmp =>
      fs.mkdirs(new Path(tmp))) // a stub family — NOT q134's real 'pq' root
    val lockDir = new Path(new Path(pqRoot).getParent,
      s".lock_${new Path(pqRoot).getName}")
    fs.mkdirs(lockDir)
    val held = Lease.acquire(spark, lockDir.toString, "in-flight-pq-build")
    try {
      // the hybrid family resolves (cached from the earlier test, or
      // builds) WITHOUT waiting on the pq lease — if cachedRoot still
      // leased the shared parent this would block ~30 min and time out
      val t0 = System.nanoTime()
      val sharedRoot = CurationQ7.cachedRoot(spark, sf, "shared")(tmp =>
        CurationQ7.buildHybridIndexes(spark, sf, tmp))
      assert(new java.io.File(sharedRoot).isDirectory)
      assert((System.nanoTime() - t0) / 1e9 < 60.0,
        "an unrelated family's in-flight build blocked this resolve")
    } finally Lease.release(spark, held)
  }

  test("fused top-5 overlaps the brute-force q113 fusion at >= 0.6") {
    def pairs(name: String): Set[(Long, Long)] =
      Registry.byName(name).run(spark, sf)
        .select("q_id", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("q113_rrf_hybrid")
    val indexed = pairs("q121_indexed_hybrid")
    assert(brute.nonEmpty, "brute-force fusion returned nothing")
    assert(indexed.nonEmpty, "indexed fusion returned nothing")
    val overlap = (brute & indexed).size.toDouble / brute.size
    assert(overlap >= 0.6,
      f"indexed fusion overlaps brute force at $overlap%.2f < 0.6 " +
        s"(${(brute & indexed).size}/${brute.size})")
  }
}
