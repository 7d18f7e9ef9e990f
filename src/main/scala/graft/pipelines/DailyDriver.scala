package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The daily corpus-curation driver as a STORAGE protocol — the
  * composition DailyDriverSpec proves, packaged as the two calls a
  * corpus owner actually makes:
  *
  * {{{
  *   DailyDriver.init(spark, corpus, bench, dir, cfg)   // day 0
  *   DailyDriver.step(spark, arrivals, bench, dir, cfg) // every day after
  * }}}
  *
  * Layout under `dir`:
  *  - `decisions/`  — the current decision table (Curation.DecisionCols)
  *  - `sig_index/`  — LSH signature index over the current CANDIDATES
  *    (docs passing quality + contamination), the relation
  *    `StreamOps.streamingNearDup` and `curateIncremental` probe
  *
  * Each step recomputes ONLY the arrivals and the prior components they
  * touch (`Curation.curateIncremental` — proven row-equal to a full
  * rerun), appends the new candidates' signatures to the index, and
  * swaps the decision table in atomically (write-new → delete-old →
  * rename, safe because curateIncremental materializes its result
  * eagerly before the old table is touched). The index append is plain
  * parquet append: an aborted step can leave it behind a partially
  * duplicated day — duplicate signature rows only duplicate pair EDGES,
  * which the connected-components decision absorbs, so a retried step
  * converges; a transactional table format replaces this at fleet
  * scale.
  *
  * Contract: arrivals' doc_ids are disjoint from every prior day's
  * (re-crawls are deduped upstream — `StreamOps.streamingCurate`), and
  * `cfg`/`benchmark` match day 0 — a changed policy means re-`init`.
  */
object DailyDriver {

  private def decisionsDir(dir: String) = s"$dir/decisions"
  private def indexDir(dir: String) = s"$dir/sig_index"

  private def candidates(docs: DataFrame, decisions: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .join(decisions.filter(col("quality_pass") && col("contam_pass"))
        .select(col("doc_id")), Seq("doc_id"))

  /** Day 0: full `curate` over the corpus; persist the decision table
    * and the candidates' signature index. */
  def init(spark: SparkSession, docs: DataFrame, benchmark: DataFrame,
           dir: String, cfg: Curation.Config = Curation.Config()): Unit = {
    Curation.curate(docs, benchmark, cfg)
      .select(Curation.DecisionCols.map(col): _*)
      .write.mode("overwrite").parquet(decisionsDir(dir))
    val decisions = spark.read.parquet(decisionsDir(dir))
    graft.streaming.StreamOps.signatureIndex(candidates(docs, decisions))
      .write.mode("overwrite").parquet(indexDir(dir))
  }

  /** Day N: delta-curate the arrivals against the persisted state,
    * append their candidate signatures, swap the decision table.
    * @return the updated decision table (read back from storage) */
  def step(spark: SparkSession, newDocs: DataFrame, benchmark: DataFrame,
           dir: String, cfg: Curation.Config = Curation.Config()): DataFrame = {
    import org.apache.hadoop.fs.Path
    val prev = spark.read.parquet(decisionsDir(dir))
    val prevIndex = spark.read.parquet(indexDir(dir))
    // eager (localCheckpoint inside): fully materialized before any
    // directory below is touched
    val updated = Curation.curateIncremental(prev, prevIndex, newDocs, benchmark, cfg)
    graft.streaming.StreamOps.signatureIndex(candidates(newDocs, updated))
      .write.mode("append").parquet(indexDir(dir))
    val dst = new Path(decisionsDir(dir))
    val tmp = new Path(decisionsDir(dir) + "__new")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    updated.write.parquet(tmp.toString)
    fs.delete(dst, true)
    require(fs.rename(tmp, dst), s"decision-table swap failed: $tmp -> $dst")
    spark.read.parquet(decisionsDir(dir))
  }
}
