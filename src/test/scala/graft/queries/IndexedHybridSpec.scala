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
    val vecScans = plan.linesIterator.filter(_.contains("/vec/base")).toSeq
    assert(vecScans.nonEmpty, s"no VecIndex cell scan in plan:\n$plan")
    assert(vecScans.forall(l => l.contains("PartitionFilters: [") && l.contains("cid")),
      s"VecIndex scan not pruned on cid:\n${vecScans.mkString("\n")}")
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
