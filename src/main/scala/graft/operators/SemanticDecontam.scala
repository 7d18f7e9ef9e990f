package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space benchmark decontamination: flag corpus vectors within
  * a cosine threshold of ANY benchmark vector — the shingle-overlap
  * decontamination recipe (q70, `pipelines.Curation.score`) in vector
  * clothing, catching eval-set contamination that survives paraphrase
  * (which token-shingle overlap misses).
  *
  * Scale shape: the benchmark set collapses to ONE id-sorted array of
  * (id, vec, norm) structs broadcast to every task; the corpus side is
  * pure map work — an `aggregate` fold over the broadcast array taking
  * the (cos, bench_id) maximum with strict-> first-wins semantics, so
  * cosine ties resolve to the LOWEST bench id (the ROW_NUMBER
  * tie-break, engine-portable). Zero corpus shuffle; a flag batch reads
  * the corpus once. Past the broadcast ceiling (benchmark sets of many
  * millions of vectors) the bucketed-join fallback pattern
  * (`Curation.score`'s size switch over `Bucketing`) applies unchanged.
  *
  * Zero-norm discipline: zero-norm vectors are excluded from BOTH sides
  * (cos undefined), matching VecIndex.build/search.
  *
  * Registry face: q98 (`queries/CurationQ4.scala`), oracle-paired.
  */
object SemanticDecontam {

  private def callDot(a: Column, b: Column) = call_function("float_dot", a, b)

  /** Corpus rows whose max cosine against the benchmark set reaches
    * `threshold`: (id, bench_id, max_cos), ordered by nothing — callers
    * sort. `corpus` and `bench` both need (idCol, vecCol). */
  def flag(corpus: DataFrame, bench: DataFrame, idCol: String,
           vecCol: String, threshold: Double): DataFrame = {
    def normed(df: DataFrame) = df
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        sqrt(callDot(col(vecCol), col(vecCol))).as("__nrm"))
      .filter(col("__nrm") > 0.0)
    val benchArr = normed(bench)
      .agg(array_sort(collect_list(struct(col("__id").as("b_id"),
        col("__v").as("b_vec"), col("__nrm").as("b_nrm")))).as("bench"))
    normed(corpus)
      .crossJoin(broadcast(benchArr))
      .withColumn("best",
        aggregate(col("bench"),
          struct(lit(-2.0).as("cos"), lit(-1L).as("b_id")),
          (acc, b) => {
            val c = callDot(col("__v"), b.getField("b_vec")) /
              (col("__nrm") * b.getField("b_nrm"))
            when(c > acc.getField("cos"),
              struct(c.as("cos"), b.getField("b_id").as("b_id")))
              .otherwise(acc)
          }))
      .withColumn("max_cos", col("best").getField("cos"))
      .withColumn("bench_id", col("best").getField("b_id"))
      .filter(col("max_cos") >= threshold)
      .select(col("__id").as(idCol), col("bench_id"), col("max_cos"))
  }

  /** Index-backed decontamination: probe the persisted [[VecIndex]]
    * with the BENCHMARK vectors instead of scanning the corpus — a
    * range search over each bench vector's `nprobe` nearest cells, then
    * a per-corpus-row max. Work ∝ bench × (probed fraction of the
    * corpus), and the scan partition-prunes to the probed cells at file
    * listing — the right shape when the corpus is 100 TB, the bench is
    * thousands of vectors, and the index already exists for ANN serving
    * ([[flag]]'s one-pass scan never reads non-probed cells here).
    *
    * APPROXIMATE by cell blocking, exactly like the index's top-k
    * search: a contaminated row whose bench partners all live outside
    * the probed cells is missed — recall vs the exact [[flag]] is
    * pinned by SemanticDecontamSpec (every reported row is a TRUE
    * match; `max_cos` can only understate). Ties resolve to the lowest
    * bench id via the max over (cos, −bench_id) structs — the same
    * tie-break as [[flag]]. The index must hold only corpus rows (build
    * it from the corpus side; a bench row indexed as corpus would flag
    * itself — which IS contamination semantics, but of the index, not
    * the corpus). */
  def flagIndexed(index: DataFrame, centroids: DataFrame, bench: DataFrame,
                  idCol: String, vecCol: String, threshold: Double,
                  nprobe: Int = 3): DataFrame = {
    // probe-sized assignment: the bench set is a bounded query workload
    // — skip the corpus-fan-out spread (round 14, per-job constants)
    val probes = KMeans
      .assignTopPrepared(KMeans.prep(bench, idCol, vecCol), idCol,
        centroids, nprobe)
      .select(col(idCol).as("q_id"), col("cid").as("q_cid"))
      .join(bench.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
        Seq("q_id"))
    VecIndex.rangeSearch(index, probes, idCol, vecCol, threshold)
      // multi-probe can surface the same (corpus, bench) pair through
      // several cells; the max-struct aggregate dedups and argmaxes in
      // one partial-aggregatable pass (no window)
      .groupBy(col(idCol))
      .agg(max(struct(col("cos").as("cos"), (-col("q_id")).as("nb"))).as("m"))
      .select(col(idCol), (-col("m.nb")).as("bench_id"),
        col("m.cos").as("max_cos"))
  }
}
