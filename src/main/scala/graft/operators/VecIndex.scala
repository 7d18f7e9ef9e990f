package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF vector index: the storage half of the ANN family.
  *
  * q55/q77/q80 demonstrate the SEARCH plan with the index built inline;
  * at fleet scale an ANN index is not a query-local relation but a
  * PARTITIONED TABLE — build once, then every search reads only its
  * probed cells through partition pruning. This operator owns that
  * lifecycle (the q76 lesson: queries over an index must not own
  * corpus-sized state — the index lives in storage, partitioned, and
  * the cell filter prunes at the file-listing level, so a search over a
  * 100 TB corpus reads nprobe/k of it).
  *
  * Layout — an LSM pair of partitioned directories:
  * {{{
  *   path/base/cid=N/part-*.parquet    // bulk builds + compactions
  *   path/delta/cid=N/part-*.parquet   // streaming appends (file sink)
  * }}}
  * rows = (id, vec, norm). The split is load-bearing, not cosmetic: the
  * exactly-once file sink governs its output directory through a
  * `_spark_metadata` log, and a reader honoring that log sees ONLY
  * log-listed files — mixing bulk-written and sink-written files in one
  * directory silently hides the bulk half (caught by DailyDriverSpec).
  * So streams append to `delta/`, bulk writes own `base/`, [[open]]
  * unions the two (the delta side read through its log, keeping the
  * exactly-once guarantee), and [[compact]] merges delta into base.
  * Search cost per probe = the probed cells' bytes only; the scan's
  * PartitionFilters prove it (asserted by VecIndexSpec).
  */
object VecIndex {

  private def baseDir(path: String) = s"$path/base"
  private def deltaDir(path: String) = s"$path/delta"

  /** Assign every vector to its nearest-by-cosine centroid and persist
    * partitioned by cell id. One broadcast join + the map-side-pruned
    * assign window (InferWindowGroupLimit) + one partitioned write — no
    * corpus-sized cache, no collect. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, path: String): Unit =
   // fenced like the maintenance ops: two racing builds would
   // interleave files under the same base layout
   Lease.withLease(emb.sparkSession, path, "vecindex-build") {
    val cents = centroids
      .select(col("cid"), col("centroid").as("c_vec"))
      .withColumn("c_norm", sqrt(callDot(col("c_vec"), col("c_vec"))))
    val w = Window.partitionBy(col("__id")).orderBy(col("__cos").desc, col("cid").asc)
    KMeans.prep(emb, idCol, vecCol)
      .crossJoin(broadcast(cents))
      .withColumn("__cos",
        callDot(col("__v"), col("c_vec")) / (col("__norm") * col("c_norm")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__v").as(vecCol),
        col("__norm").as("norm"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(baseDir(path))
  }

  /** The full index: base ∪ delta, whichever sides exist (a pure-stream
    * index has no base until its first compaction; a never-appended one
    * has no delta). Each side is a single-path read, so the delta side
    * goes through the file sink's metadata log and an aborted
    * micro-batch's orphan files stay invisible. Opens begin with
    * [[repair]]: an interrupted compaction/deletion that had already
    * committed rolls forward to the new layout first, so readers never
    * see a half-swapped index. */
  def open(spark: SparkSession, path: String): DataFrame = {
    repair(spark, path)
    val sides = Seq(baseDir(path), deltaDir(path)).filter(exists(spark, _))
    require(sides.nonEmpty, s"no index layout under $path")
    sides.map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }

  private def tmpDir(path: String) = s"$path/__compacting"
  private def markerPath(path: String) = s"$path/__compact_commit"

  /** Crash recovery for the in-place swap [[compact]]/[[delete]] use.
    * The commit MARKER is created only after the replacement data is
    * completely written, and removed only after the swap finishes — so
    * its presence means "the new layout is durable, finish the swap"
    * (roll FORWARD: drop whatever remains of base/delta, move the
    * replacement in). Its absence means any `__compacting` debris is an
    * uncommitted partial write the next maintenance run overwrites
    * (roll back by ignoring). Every step here is idempotent, so repair
    * itself can crash and re-run. */
  def repair(spark: SparkSession, path: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(markerPath(path))
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) return
    finishSwap(fs, path)
  }

  /** The roll-forward half shared by [[swapInPlace]] and [[repair]]:
    * every step keyed on existence, so it is idempotent under crashes.
    * tmp present → the swap's renames have not completed: re-drive them.
    * tmp absent → the rename landed (base IS the new layout, delta was
    * already dropped before it). A pending `__centroids_new` (written by
    * [[retrain]] BEFORE its marker) installs under the same window, so
    * rows and quantizer always publish together. */
  private def finishSwap(fs: org.apache.hadoop.fs.FileSystem,
                         path: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(baseDir(path))
    val delta = new org.apache.hadoop.fs.Path(deltaDir(path))
    val tmp = new org.apache.hadoop.fs.Path(tmpDir(path))
    if (fs.exists(tmp)) {
      fs.delete(base, true)
      fs.delete(delta, true)
      require(fs.rename(tmp, base), s"repair rename failed: $tmp -> $base")
    }
    val ctmp = new org.apache.hadoop.fs.Path(centroidsTmp(path))
    if (fs.exists(ctmp)) {
      val cdir = new org.apache.hadoop.fs.Path(centroidsDir(path))
      fs.delete(cdir, true)
      require(fs.rename(ctmp, cdir), s"repair rename failed: $ctmp -> $cdir")
    }
    fs.delete(new org.apache.hadoop.fs.Path(markerPath(path)), false)
  }

  /** Persisted quantizer location ([[retrain]] maintains it). */
  def centroidsDir(path: String): String = s"$path/centroids"
  private def centroidsTmp(path: String) = s"$path/__centroids_new"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** In-cell exact-cosine top-k over the persisted index.
    *
    * @param index  `open(...)` result
    * @param probes (q_id, q_vec, q_cid) — the probe set with its cell
    *               assignments (one row per (probe, probed cell) for
    *               multi-probe). BOUNDED by definition of a probe batch;
    *               its cell list is collected (tiny) to drive partition
    *               pruning — the pushed `cid IN (...)` is what keeps the
    *               scan to nprobe/k of the corpus. */
  def search(index: DataFrame, probes: DataFrame,
             idCol: String, vecCol: String, k: Int): DataFrame = {
    val cells = probes.select(col("q_cid")).distinct()
      .collect().map(_.get(0))
    // zero-norm guard, matching build/assignFold's indexed-side filter:
    // an unguarded zero probe makes cos = 0/0 = NaN, and Spark sorts NaN
    // ABOVE every double, so the descending top-k window would rank the
    // garbage rows first — a degenerate probe must return no rows, not
    // arbitrary ones
    val pr = probes
      .withColumn("q_norm", sqrt(callDot(col("q_vec"), col("q_vec"))))
      .filter(col("q_norm") > 0.0)
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col(idCol).asc)
    index
      // literal IN list → partition pruning at file listing; the
      // broadcast-join residual below re-checks per-probe membership
      .filter(col("cid").isin(cells.toIndexedSeq: _*))
      .join(broadcast(pr), col("cid") === col("q_cid") && col(idCol) =!= col("q_id"))
      .withColumn("cos",
        callDot(col(vecCol), col("q_vec")) / (col("norm") * col("q_norm")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col(idCol), col("cos"))
  }

  /** In-cell cosine RANGE search: every indexed vector at or above
    * `minCos` of a probe, in the probe's cells — the threshold-query
    * sibling of [[search]] (ANN range query). Same partition-pruned
    * scan (`cid IN (...)` at file listing, ~nprobe/k of the corpus),
    * but NO window at all: the result is an open-ended match set, so
    * the plan is scan → broadcast probe join → filter — strictly
    * map-side after the pruned read. Unlike [[search]] there is no
    * self-exclusion: a probe finding its own stored copy IS a match
    * (the decontamination semantics — [[SemanticDecontam.flagIndexed]]).
    *
    * @param probes (q_id, q_vec, q_cid), one row per (probe, probed
    *               cell) for multi-probe — bounded by definition */
  def rangeSearch(index: DataFrame, probes: DataFrame,
                  idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val cells = probes.select(col("q_cid")).distinct()
      .collect().map(_.get(0))
    val pr = probes
      .withColumn("q_norm", sqrt(callDot(col("q_vec"), col("q_vec"))))
      .filter(col("q_norm") > 0.0)
    index
      .filter(col("cid").isin(cells.toIndexedSeq: _*))
      .join(broadcast(pr), col("cid") === col("q_cid"))
      .withColumn("cos",
        callDot(col(vecCol), col("q_vec")) / (col("norm") * col("q_norm")))
      .filter(col("cos") >= minCos)
      .select(col("q_id"), col(idCol), col("cos"))
  }

  /** Streaming-safe cell assignment: a map-side fold over the collected
    * centroid array — no window and no aggregation on the vector stream,
    * so it composes with any streaming sink (rank windows are illegal in
    * streaming plans). Semantics match the window-based assign exactly:
    * highest cosine wins, ties break toward the lowest cell id (the
    * fold compares `struct(cos, -cid)` structs, so the comparison is
    * one lexicographic op per centroid). Works on batch frames too —
    * VecIndexSpec asserts batch equivalence against `KMeans.assign`. */
  def assignFold(emb: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val centArr = centroids
      .select(col("cid").cast("int").as("cid"), col("centroid").as("c_vec"))
      .withColumn("c_norm", sqrt(callDot(col("c_vec"), col("c_vec"))))
      .agg(collect_list(struct(col("cid"), col("c_vec"), col("c_norm"))).as("__cents"))
    val init = struct(lit(Double.NegativeInfinity).as("cos"),
      lit(Int.MinValue).as("neg"))
    emb
      .select(col(idCol), col(vecCol).cast(ArrayType(FloatType)).as(vecCol))
      .withColumn("norm", sqrt(callDot(col(vecCol), col(vecCol))))
      .filter(col("norm") > 0.0)
      .crossJoin(broadcast(centArr))
      .withColumn("__best", aggregate(col("__cents"), init, (acc, c) => {
        val cand = struct(
          (callDot(col(vecCol), c.getField("c_vec")) /
            (col("norm") * c.getField("c_norm"))).as("cos"),
          (-c.getField("cid")).as("neg"))
        when(cand > acc, cand).otherwise(acc)
      }))
      .withColumn("cid", (-col("__best.neg")).cast("int"))
      .withColumn("cos", col("__best.cos"))
      .drop("__cents", "__best")
  }

  /** Incremental index maintenance: assign arriving vectors with
    * [[assignFold]] and append them to the DELTA side of the layout
    * through the exactly-once parquet file sink. New rows land in their
    * `delta/cid=N/` directories, so searches over `open(path)` keep
    * pruning correctly as the index grows; [[compact]] folds the delta
    * into the base offline, exactly like any LSM-flavored index. */
  def appendStream(embStream: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame, path: String,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    assignFold(embStream, idCol, vecCol, centroids)
      .select(col(idCol), col(vecCol), col("norm"), col("cid"))
      .writeStream.format("parquet")
      .option("checkpointLocation", checkpoint)
      .partitionBy("cid")
      .outputMode("append")
      .start(deltaDir(path))

  /** Offline compaction: fold the streamed delta into the base and
    * reset the layout to a single bulk-written side. Every micro-batch
    * lands a file per touched `delta/cid=N/` directory, so a
    * long-running ingest accumulates files whose per-file overhead
    * eventually dominates the scan. One range shuffle on (cid, id)
    * clusters each cell into a contiguous run — a partition holds at
    * most a couple of cells, a cell receives at most a couple of
    * files — written to a temp directory and swapped in via
    * same-filesystem renames (never read-and-overwrite in place).
    * Idempotent: rows and the cid partition layout are unchanged by a
    * second run; VecIndexSpec asserts row identity and that searches
    * keep pruning.
    *
    * LSM handoff discipline: run with NO active writer, and restart the
    * append stream with a fresh checkpoint afterwards — the compaction
    * consumes the delta directory and its sink log, so a resumed old
    * checkpoint would re-govern a directory whose history is gone. */
  def compact(spark: SparkSession, path: String, idCol: String): Unit =
    swapInPlace(spark, path,
      open(spark, path).repartitionByRange(col("cid"), col(idCol)))

  /** Remove vectors from the index — the retraction path (takedowns,
    * decontamination) — [[graft.operators.LexIndex.delete]]'s vector
    * counterpart. Implemented as a compaction that drops the victims:
    * cell assignment is per-row, so surviving rows keep their cid and
    * `delete(build(A ∪ B), ids(B))` row-equals `build(A)` (VecIndexSpec).
    * Unlike LexIndex there is no per-bucket saving to chase: the cell
    * count is small by design (a coarse quantizer), so victims touch
    * most cells and a full clustered rewrite is the honest cost — and
    * it shares [[compact]]'s crash contract (commit marker + repair)
    * and its LSM handoff discipline (no active writer; restart streams
    * on a fresh checkpoint). Ids absent from the index are no-ops. */
  def delete(spark: SparkSession, path: String, idCol: String,
             ids: DataFrame): Unit =
    swapInPlace(spark, path,
      open(spark, path)
        .join(broadcast(ids.select(col(idCol)).distinct()), Seq(idCol), "left_anti")
        .repartitionByRange(col("cid"), col(idCol)))

  /** Re-train the coarse quantizer against the CURRENT rows and re-cell
    * the index — the drift-maintenance half [[compact]]/[[delete]] leave
    * open: appends assign against day-0 centroids, so a drifting corpus
    * piles into few cells and search degrades toward a serial scan of
    * one giant cell. Retraining runs [[KMeans.lloyd]] over the live rows
    * (deterministic, RNG-free), re-assigns every row with the
    * streaming-safe [[assignFold]], and lands the re-celled layout under
    * the SAME commit-marker + [[repair]] contract as compaction — a
    * crash at any point leaves the old or the complete new layout.
    *
    * The vector SET is untouched (same ids, same vectors, same norms —
    * only `cid` moves; VecIndexSpec proves row identity and that
    * post-drift cell skew drops). New centroids are returned AND
    * persisted under `path/centroids` so probe assignment and future
    * appends pick them up — installed INSIDE the same marker window as
    * the re-celled rows (written to `__centroids_new` before the marker,
    * renamed in by the swap's roll-forward), so a crash can never leave
    * new cells paired with the old quantizer or vice versa. Same handoff
    * discipline as [[compact]]: no active writer, restart append streams
    * on a fresh checkpoint.
    *
    * @return the trained centroids (cid, centroid) — materialized, safe
    *         to use after the swap */
  def retrain(spark: SparkSession, path: String, idCol: String, vecCol: String,
              k: Int, iters: Int = 5): DataFrame = {
    val rows = open(spark, path)
    val cents = KMeans.lloyd(rows, idCol, vecCol, k, iters).localCheckpoint()
    val recelled = assignFold(rows, idCol, vecCol, cents)
      .select(col(idCol), col(vecCol), col("norm"), col("cid"))
      .repartitionByRange(col("cid"), col(idCol))
    swapInPlace(spark, path, recelled, newCentroids = Some(cents))
    cents
  }

  /** Cell-occupancy skew of the live index: the hottest cell's share of
    * all rows (1/k is perfectly balanced, →1.0 is the degenerate drift
    * end state where search decays toward a serial scan of one giant
    * cell). One column-pruned scan of `cid` — at fleet scale this is a
    * per-partition count, no vector payloads move. 0.0 on an empty
    * index (nothing to rebalance). */
  def cellSkew(spark: SparkSession, path: String): Double = {
    val occ = open(spark, path).groupBy(col("cid")).count()
      .agg(max(col("count")).as("mx"), sum(col("count")).as("n"))
      .collect().head
    if (occ.isNullAt(1) || occ.getLong(1) == 0L) 0.0
    else occ.getLong(0).toDouble / occ.getLong(1).toDouble
  }

  /** The POLICY form of [[retrain]] — the call a maintenance window
    * makes: measure [[cellSkew]] and re-train only when the hottest
    * cell holds more than `maxCellShare` of the index. Below the
    * threshold the index is untouched (no swap, no new version — the
    * measurement is the whole cost), so running this every window is
    * cheap and the expensive re-cell happens only when drift has
    * actually concentrated the corpus. Same no-active-writer handoff
    * contract as [[retrain]].
    *
    * @return true iff a retrain ran */
  def maintainIfSkewed(spark: SparkSession, path: String, idCol: String,
                       vecCol: String, k: Int, maxCellShare: Double = 0.25,
                       iters: Int = 5): Boolean = {
    val skew = cellSkew(spark, path)
    if (skew <= maxCellShare) false
    else { retrain(spark, path, idCol, vecCol, k, iters); true }
  }

  /** The guarded in-place swap behind [[compact]]/[[delete]]: write the
    * full replacement under `__compacting`, create the COMMIT MARKER
    * (the point of no return — from here [[repair]] rolls forward), then
    * drop base+delta and rename the replacement in. A crash before the
    * marker leaves the old index untouched (debris overwritten next
    * run); a crash after it is finished by the next [[open]]. */
  private def swapInPlace(spark: SparkSession, path: String, rows: DataFrame,
                          newCentroids: Option[DataFrame] = None): Unit =
   // maintenance ops are single-writer by contract; the lease makes a
   // second concurrent compact/delete/retrain fail FAST instead of
   // racing the same __compacting paths (crashed holders age out)
   Lease.withLease(spark, path, "vecindex-maintenance") {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(tmpDir(path))
    val marker = new Path(markerPath(path))
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    repair(spark, path) // finish an interrupted predecessor first
    fs.delete(tmp, true) // uncommitted debris from an aborted earlier run
    // stale centroid debris from an aborted RETRAIN must not ride along
    // with an unrelated compact/delete — only this call's own centroids
    // may be pending when the marker lands
    fs.delete(new Path(centroidsTmp(path)), true)
    rows.write.mode("overwrite").partitionBy("cid").parquet(tmp.toString)
    newCentroids.foreach(
      _.write.mode("overwrite").parquet(centroidsTmp(path)))
    fs.create(marker, true).close()
    finishSwap(fs, path)
  }

  private def callDot(a: Column, b: Column): Column =
    call_function("float_dot", a, b)
}
