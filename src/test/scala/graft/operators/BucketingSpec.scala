package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The co-located join contract: two tables bucketed on the join key
  * with the same bucket count join with ZERO shuffle exchange — the
  * fleet-scale shape the near-dup verify stage falls back to when the
  * per-doc token dimension outgrows the broadcast ceiling.
  */
class BucketingSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  // per-run table names: the warehouse is shared state, so a fixed name
  // would collide across parallel suites or with an aborted run's leftovers
  private val tDocs = s"b_docs_$runTag"
  private val tPairs = s"b_pairs_$runTag"
  private val tLookup = s"b_lookup_$runTag"

  test("co-bucketed join plans without any shuffle exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), length(col("text")).as("len"))
    // a pair-like relation keyed on doc_id (the verify-stage probe side)
    val pairs = docs.select(col("doc_id"), (col("doc_id") % 7).as("grp"))
    Bucketing.persistBucketed(docs, tDocs, "doc_id", 4)
    Bucketing.persistBucketed(pairs, tPairs, "doc_id", 4)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table(tDocs).join(spark.table(tPairs), "doc_id")
        assert(joined.count() == docs.count(), "join lost rows")
        val p = joined.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
        assert(!p.contains("Exchange hashpartitioning"),
          s"co-bucketed join still shuffled:\n$p")
        // bucketed scans read with the bucket spec applied
        assert(p.contains("Bucketed: true"),
          s"scan did not use the bucket layout:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tDocs")
      spark.sql(s"DROP TABLE IF EXISTS $tPairs")
    }
  }

  test("bucket-pruned point lookup reads a single bucket") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    Bucketing.persistBucketed(docs, tLookup, "doc_id", 4)
    // a bare filter imposes no distribution requirement, so the planner's
    // auto-bucketed-scan heuristic would drop the bucket layout — and with
    // it the pruning this test demonstrates
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val q = spark.table(tLookup).filter(col("doc_id") === 42L)
      assert(q.count() == 1)
      val p = q.queryExecution.executedPlan.toString
      // SelectedBucketsCount: 1 out of 4 proves bucket pruning fired
      assert(p.contains("SelectedBucketsCount: 1 out of 4"),
        s"point lookup did not prune to one bucket:\n$p")
    } finally {
      spark.conf.set(key, prev)
      spark.sql(s"DROP TABLE IF EXISTS $tLookup")
    }
  }
}
