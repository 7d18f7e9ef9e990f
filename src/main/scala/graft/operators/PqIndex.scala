package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ (IVFADC) index — the production 100 TB ANN shape
  * PERSISTED: [[VecIndex]] stores raw float vectors per cell, which is
  * the exact-rerank layout; at fleet scale the corpus-resident search
  * state is the PQ CODE table instead — m code bytes + a cell id per
  * vector (~32× smaller than float32 embeddings), with the quantizers
  * pinned beside it. q95 demonstrates the full search plan inline
  * (`pq_encode`/`pq_dtab`/`pq_adc` kernels); this operator owns the
  * storage lifecycle so the recurring workload reads ~nprobe/nc of the
  * code table and nothing corpus-sized is ever re-derived per batch.
  *
  * Layout — the [[Versioned]] manifest discipline ([[VecIndex]]'s,
  * byte-for-byte the same protocol):
  * {{{
  *   path/cells/v=V/cid=N/part-*.parquet   // (id, codes) — the code table
  *   path/delta/e=E/cid=N/part-*.parquet   // batch appends (job-committed)
  *   path/quant/v=V/part-*.parquet         // ONE row: g_cents, g_ccs, cents, ccs
  *   path/manifest/v=V.txt                 // "base:B", "epoch:E", "cents:Q"
  * }}}
  * Mutations write fresh `v=N+1` paths and publish one atomic manifest
  * rename; readers resolve the manifest once and get pinned snapshots;
  * [[gc]] uses the shared supersession-bounded grace rule. Codes are
  * meaningful only under the quantizer that produced them, so the
  * quantizer row and the code table always publish from the SAME
  * manifest — [[build]] installs both in one rename, and [[append]]
  * encodes against the pinned row ([[openQuant]]).
  *
  * Quantizer shape: `g_cents`/`g_ccs` is the coarse quantizer as ONE
  * 1×nc "subspace" codebook (coarse assignment IS `pq_encode` with a
  * single whole-vector subspace — q95's trick), `cents`/`ccs` the m
  * sub-codebooks over the RESIDUAL (vec − coarse centroid). Build it
  * from [[PQ.trainCodebooks]] output via [[PQ.codebookRow]], or any
  * deterministic convention (the specs use q95's donor-id convention).
  *
  * Mutations are single-writer under the path [[Lease]], like every
  * index in the storage layer.
  *
  * Quantizer refresh: unlike [[VecIndex.retrain]], the code table is
  * LOSSY — codes cannot be re-encoded from the index's own contents —
  * so refreshing the quantizer against a drifted corpus is a re-[[build]]
  * from the source embeddings with the new quantizer row (one encode
  * scan, the same cost build always pays; the atomic publish makes it a
  * drop-in replacement under live readers).
  */
object PqIndex {

  private def cellsDir(path: String) = s"$path/cells"
  private def deltaDir(path: String) = s"$path/delta"
  private def quantDir(path: String) = s"$path/quant"

  private def cellsPath(path: String, v: Long) = s"${cellsDir(path)}/v=$v"
  private def deltaPath(path: String, e: Long) = s"${deltaDir(path)}/e=$e"
  private def quantPath(path: String, v: Long) = s"${quantDir(path)}/v=$v"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def currentVersion(spark: SparkSession, path: String): Long =
    Versioned.currentVersion(spark, path)

  /** The pinned quantizer row (g_cents, g_ccs, cents, ccs) at the
    * current manifest. */
  def openQuant(spark: SparkSession, path: String): DataFrame =
    quantAt(spark, path, Versioned.current(spark, path))

  private def quantAt(spark: SparkSession, path: String,
                      m: Versioned.Man): DataFrame = {
    require(m.cents > 0L, s"no quantizer published under $path — build first")
    spark.read.parquet(quantPath(path, m.cents))
  }

  /** The coarse centroid of `cell`, off the quantizer row's columns —
    * the residual arithmetic every encode/search site shares. */
  private def coarseCent(cell: Column): Column =
    element_at(element_at(col("g_cents"), 1), cell + lit(1))

  private def residual(vec: Column, cell: Column): Column =
    call_function("float_sub", vec, coarseCent(cell))

  /** Encode a vector relation against a quantizer row: coarse cell +
    * residual PQ codes — ONE map-side kernel pass, no shuffle. */
  private def encode(emb: DataFrame, idCol: String, vecCol: String,
                     quant: DataFrame): DataFrame =
    emb.crossJoin(broadcast(quant))
      .withColumn("cid",
        element_at(call_function("pq_encode", col(vecCol),
          col("g_cents"), col("g_ccs")), 1).cast("int"))
      .withColumn("codes",
        call_function("pq_encode", residual(col(vecCol), col("cid")),
          col("cents"), col("ccs")))
      .select(col(idCol), col("codes"), col("cid"))

  /** Build the code table from scratch: encode every vector (one
    * map-side kernel scan), land it partitioned by coarse cell, install
    * the quantizer row, publish — codes and quantizer in ONE manifest
    * step. The delta side (if any) is untouched, like [[VecIndex.build]].
    *
    * @param quant ONE row (g_cents, g_ccs, cents, ccs) — see the class
    *              doc; materialized small, broadcast into the encode */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            quant: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    Lease.withLease(spark, path, "pqindex-build") {
      val m = Versioned.current(spark, path)
      val n = m.v + 1
      encode(emb, idCol, vecCol, quant)
        .repartitionByRange(col("cid"), col(idCol))
        .write.mode("overwrite").partitionBy("cid").parquet(cellsPath(path, n))
      quant.write.mode("overwrite").parquet(quantPath(path, n))
      Versioned.publish(spark, path, n, base = n, epoch = m.epoch, cents = n)
    }
  }

  /** The live code table (id, codes, cid) as a pinned snapshot:
    * cells ∪ current delta epoch, whichever exist. */
  def open(spark: SparkSession, path: String): DataFrame =
    tryOpen(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no index layout under $path"))

  def tryOpen(spark: SparkSession, path: String): Option[DataFrame] =
    openAt(spark, path, Versioned.current(spark, path))

  private def openAt(spark: SparkSession, path: String,
                     m: Versioned.Man): Option[DataFrame] = {
    val bulk =
      if (m.base > 0L && Versioned.hasCells(spark, cellsPath(path, m.base)))
        Some(spark.read.option("basePath", cellsDir(path))
          .parquet(cellsPath(path, m.base)).drop("v"))
      else None
    val delta =
      if (Versioned.hasCells(spark, deltaPath(path, m.epoch)))
        Some(spark.read.parquet(deltaPath(path, m.epoch)))
      else None
    (bulk.toSeq ++ delta.toSeq).reduceOption(_.unionByName(_))
  }

  /** Batch incremental append: encode the arrivals against the PINNED
    * quantizer and land them in the current delta epoch in one
    * job-committed write — [[VecIndex.append]]'s discipline, including
    * the replay probe ([[containsAny]]) and the sink-log guard. */
  def append(emb: DataFrame, idCol: String, vecCol: String,
             path: String): Unit = {
    val spark = emb.sparkSession
    Lease.withLease(spark, path, "pqindex-append") {
      val m = Versioned.current(spark, path)
      val dir = deltaPath(path, m.epoch)
      require(!exists(spark, s"$dir/_spark_metadata"),
        s"delta epoch ${m.epoch} is governed by a streaming sink log — " +
          s"batch appends would be invisible to readers; compact first")
      encode(emb, idCol, vecCol, openQuant(spark, path))
        .write.mode("append").partitionBy("cid").parquet(dir)
    }
  }

  /** Whether ANY of `ids` is already indexed — the landed-or-not probe
    * a retried append needs; false on a never-built index. */
  def containsAny(spark: SparkSession, path: String, ids: DataFrame): Boolean =
    tryOpen(spark, path) match {
      case None => false
      case Some(idx) =>
        !idx.select(col(ids.columns.head))
          .join(broadcast(ids.distinct()), Seq(ids.columns.head), "left_semi")
          .isEmpty
    }

  /** Fold the delta into a fresh cells version and bump the epoch in
    * one publish — [[VecIndex.compact]] for the code table (codes are
    * cell-stable, so the fold is a pure re-cluster). Pinned readers
    * keep their version; [[gc]] collects it after `gcGraceMs`. */
  def compact(spark: SparkSession, path: String, idCol: String,
              gcGraceMs: Long = 0L): Unit =
    Lease.withLease(spark, path, "pqindex-maintenance") {
      val m = Versioned.current(spark, path)
      val rows = tryOpen(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no index layout under $path"))
      val n = m.v + 1
      rows.repartitionByRange(col("cid"), col(idCol))
        .write.mode("overwrite").partitionBy("cid").parquet(cellsPath(path, n))
      Versioned.publish(spark, path, n, base = n, epoch = m.epoch + 1L,
        cents = m.cents)
      gcLocked(spark, path, gcGraceMs)
    }

  /** Remove ids from the code table — the retraction path, sharing
    * [[compact]]'s publish contract. Absent ids are no-ops. */
  def delete(spark: SparkSession, path: String, idCol: String,
             ids: DataFrame): Unit =
    Lease.withLease(spark, path, "pqindex-maintenance") {
      val m = Versioned.current(spark, path)
      val rows = tryOpen(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no index layout under $path"))
      val n = m.v + 1
      rows.join(broadcast(ids.select(col(idCol)).distinct()), Seq(idCol), "left_anti")
        .repartitionByRange(col("cid"), col(idCol))
        .write.mode("overwrite").partitionBy("cid").parquet(cellsPath(path, n))
      val emptied = !new Path(cellsPath(path, n))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(new Path(cellsPath(path, n)))
        .exists(_.getPath.getName.startsWith("cid="))
      Versioned.publish(spark, path, n, base = if (emptied) 0L else n,
        epoch = m.epoch + 1L, cents = m.cents)
    }

  /** [[Versioned.gcSweep]] over this layout's families — same
    * supersession-bounded grace rule as the other indexes. */
  def gc(spark: SparkSession, path: String, graceMs: Long = 0L): Unit =
    Lease.withLease(spark, path, "pqindex-gc") {
      gcLocked(spark, path, graceMs)
    }

  private def gcLocked(spark: SparkSession, path: String, graceMs: Long): Unit = {
    val m = Versioned.current(spark, path)
    if (m.v == 0L) return
    Versioned.gcSweep(spark, path, m, graceMs, Seq(
      (cellsDir(path), "v=", (v: Long) => v == m.base),
      (deltaDir(path), "e=", (v: Long) => v == m.epoch),
      (quantDir(path), "v=", (v: Long) => v == m.cents)))
  }

  /** Share of code-table bytes in the current delta epoch — the policy
    * trigger, two driver-side content summaries ([[VecIndex
    * .deltaShare]]). */
  def deltaShare(spark: SparkSession, path: String): Double = {
    val m = Versioned.current(spark, path)
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytes(dir: String): Long = {
      val p = new Path(dir)
      if (!f.exists(p)) 0L else f.getContentSummary(p).getLength
    }
    val delta = bytes(deltaPath(path, m.epoch))
    val base = if (m.base > 0L) bytes(cellsPath(path, m.base)) else 0L
    if (delta + base == 0L) 0.0 else delta.toDouble / (delta + base).toDouble
  }

  /** @return true iff the gated fold ran */
  def compactIfDelta(spark: SparkSession, path: String, idCol: String,
                     maxDeltaShare: Double = 0.2,
                     gcGraceMs: Long = 0L): Boolean = {
    val share = deltaShare(spark, path)
    if (share <= maxDeltaShare) false
    else { compact(spark, path, idCol, gcGraceMs); true }
  }

  /** ADC top-k over the persisted code table: the probes' cells and
    * per-cell asymmetric distance tables derive from the PINNED
    * quantizer (workload-sized, broadcast); the code scan prunes to the
    * probed cells at file listing; `pq_adc` folds the m code lookups
    * per candidate. Identical arithmetic to q95's inline plan —
    * PqIndexSpec pins row equality.
    *
    * @param probes (q_id, q_vec) — workload-sized
    * @param k      results per probe
    * @param nprobe coarse cells searched per probe */
  def search(spark: SparkSession, path: String, probes: DataFrame,
             idCol: String, k: Int, nprobe: Int): DataFrame = {
    // ONE manifest resolution pins quantizer AND code table to the same
    // published version — resolving them separately could pair new codes
    // with an old quantizer across a concurrent build's publish, and
    // pq_adc would score silently wrong distances
    val m = Versioned.current(spark, path)
    val quant = quantAt(spark, path, m)
    val idx = openAt(spark, path, m).getOrElse(
      throw new IllegalArgumentException(s"no index layout under $path"))
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("qc_d2").asc, col("cid").asc)
    // workload-sized; materialized ONCE (the cell-id collect below and
    // the broadcast join would otherwise each re-run the probes × nc
    // coarse table and its rank window)
    val probeCells = probes.crossJoin(broadcast(quant))
      .select(col("q_id"), col("q_vec"), col("g_cents"), col("cents"), col("ccs"),
        posexplode(element_at(call_function("pq_dtab", col("q_vec"),
          col("g_cents"), col("g_ccs")), 1)).as(Seq("cid", "qc_d2")))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= nprobe)
      .withColumn("dtab",
        call_function("pq_dtab", residual(col("q_vec"), col("cid")),
          col("cents"), col("ccs")))
      .select(col("q_id"), col("cid"), col("dtab"))
      .localCheckpoint()
    // tiny collect (≤ probes × nprobe cell ids) drives partition pruning
    val cells = probeCells.select(col("cid")).distinct()
      .collect().map(_.get(0))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_d2").asc, col(idCol).asc)
    idx
      .filter(col("cid").isin(cells.toIndexedSeq: _*))
      .join(broadcast(probeCells), Seq("cid"))
      .withColumn("approx_d2",
        call_function("pq_adc", col("codes"), col("dtab")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col(idCol), col("cid"),
        col("approx_d2"))
  }
}
