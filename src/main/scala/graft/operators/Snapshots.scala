package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sealed, versioned TRAINING-SET snapshots — the reproducibility
  * record a corpus owner cuts before every training run: "run T trained
  * on snapshot v=N" must stay answerable (and auditable) months later,
  * after thousands of daily steps have rewritten the live decision
  * table the run was actually fed from.
  *
  * This is deliberately NOT the [[Versioned]] current-pointer protocol
  * the index families share: an index has ONE live version and
  * superseded debris; a snapshot history is APPEND-ONLY — every sealed
  * version stays independently readable until an explicit retention
  * decision retires it. Layout under `root`:
  *
  *  - `snap/v=N/`      — the sealed rows (decision columns + the per-doc
  *    content fingerprint), immutable once sealed
  *  - `seal/v=N.txt`   — the seal marker whose atomic rename IS the
  *    commit: a version exists iff its marker does, so a create that
  *    crashes mid-write leaves only invisible `snap/` debris the next
  *    create overwrites (same version number — `versions` never counted
  *    the unsealed dir) and gc eventually sweeps
  *  - `seal/.retired-v=N.txt` — gc's two-phase retirement: pass 1
  *    un-publishes (fresh-mtime retired marker, seal deleted), pass 2
  *    deletes the data only after `graceMs` has passed SINCE THE
  *    RETIREMENT — a reader that checked the seal just before the
  *    retention decision gets a full grace to finish, the same vacuum
  *    rule as the index families but aged from the un-publish the
  *    marker records instead of an unknowable policy flip
  *
  * Mutators (create / gc / redact) serialize through the root's writer
  * [[Lease]]; readers never take it. [[redact]] is the takedown cascade
  * through sealed history: a forgotten document's rows leave every
  * sealed version too, in place (version numbers and seal markers
  * survive; the per-version rewrite is a crash-atomic [[AtomicSwap]]
  * swap that [[open]]'s repair step completes after a torn one).
  */
object Snapshots {

  private val SealName = "v=(\\d+)\\.txt".r
  private val RetiredName = "\\.retired-v=(\\d+)\\.txt".r
  private val SnapDirName = "v=(\\d+)".r

  private def snapDir(root: String, v: Long) = s"$root/snap/v=$v"
  private def sealRoot(root: String) = s"$root/seal"
  private def sealFile(root: String, v: Long) =
    new Path(sealRoot(root), s"v=$v.txt")

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The content fingerprint a snapshot seals per document — the
    * engine's portable polynomial hash ([[graft.functions.TextFunctions
    * .strHash]]), so [[verify]]'s "is the corpus the run saw still the
    * corpus" check is cheap (two longs per doc, no text retained in the
    * snapshot) and the sealed value is reproducible bit-for-bit by the
    * DuckDB oracle. */
  def fingerprint(text: Column): Column =
    graft.functions.TextFunctions.strHash(text)

  /** `(doc_id, fp, len)` for a corpus relation — the frame the driver's
    * incremental fingerprint store appends per delta (ONE text scan per
    * delta, never per snapshot). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"),
      length(col(textCol)).cast(LongType).as("len"))

  /** Sealed versions, ascending. Only the seal marker counts — an
    * unsealed `snap/` dir is a crashed create, invisible here. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(sealRoot(root))
    val f = fsOf(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case SealName(v) => v.toLong }.sorted.toSeq
  }

  /** Versions mid-retirement (gc phase 1 done, data not yet aged out).
    * [[create]] must allocate PAST these: re-using a retired-in-grace
    * number would overwrite data a pinned reader was promised, and its
    * pending marker would schedule the fresh seal's data for deletion. */
  private def retiredVersions(f: FileSystem, root: String): Seq[Long] = {
    val dir = new Path(sealRoot(root))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case RetiredName(v) => v.toLong }.toSeq
  }

  /** Seal `rows` as the next snapshot version and return it. The data
    * write is job-committed into `snap/v=N`; the seal marker's atomic
    * rename is the single commit point (crash before it → the next
    * create re-derives the SAME version number and its overwrite-mode
    * write replaces the debris). Runs under the root's writer lease —
    * two concurrent creates cannot both allocate N. */
  def create(spark: SparkSession, root: String, rows: DataFrame): Long =
    Lease.withLease(spark, root, "snapshot-create") {
      val f0 = fsOf(spark, root)
      val v = (versions(spark, root) ++ retiredVersions(f0, root))
        .foldLeft(0L)(math.max) + 1L
      rows.write.mode("overwrite").parquet(snapDir(root, v))
      val n = spark.read.parquet(snapDir(root, v)).count()
      val f = fsOf(spark, root)
      f.mkdirs(new Path(sealRoot(root)))
      val tmp = new Path(sealRoot(root), s".tmp-v=$v.txt")
      val out = f.create(tmp, true)
      try out.write(s"rows:$n\ncreated:${System.currentTimeMillis()}\n"
        .getBytes("UTF-8"))
      finally out.close()
      // a retire/replay cycle may have left this exact name before —
      // same-version debris is legal to replace (see scaladoc)
      f.delete(sealFile(root, v), false)
      require(Lease.atomicRename(f, tmp, sealFile(root, v)),
        s"snapshot seal failed: $tmp -> ${sealFile(root, v)}")
      v
    }

  /** Read sealed version `v`. Repairs a torn [[redact]] swap first, so
    * a crash mid-redaction always resolves to a consistent (old or
    * fully-redacted) version. */
  def open(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(fsOf(spark, root).exists(sealFile(root, v)),
      s"snapshot v=$v at $root is not sealed")
    AtomicSwap.repair(spark, snapDir(root, v))
    spark.read.parquet(snapDir(root, v))
  }

  /** Row count recorded in the seal marker — [[create]] counted the
    * sealed data, so status readouts need no parquet footer scan. */
  def sealedRows(spark: SparkSession, root: String, v: Long): Long = {
    val in = fsOf(spark, root).open(sealFile(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .collectFirst { case s if s.startsWith("rows:") =>
        s.stripPrefix("rows:").toLong }
      .getOrElse(0L)
    finally in.close()
  }

  /** What changed between two sealed versions, keyed by `idCol`: one
    * `'removed'` / `'added'` / `'changed'` row per differing document
    * (unchanged documents emit nothing — on a daily corpus the diff is
    * delta-sized, not corpus-sized). `'changed'` compares exactly the
    * `compare` columns null-safely (split is null on non-kept rows by
    * contract); each comes back as a `_a`/`_b` pair. One full outer
    * sort-merge join on the id — O(|A|+|B|) shuffle, no text. */
  def diff(spark: SparkSession, root: String, vA: Long, vB: Long,
           compare: Seq[String] = Seq("keep", "split", "component",
             "dedup_keep", "fp"),
           idCol: String = "doc_id"): DataFrame = {
    def side(v: Long, tag: String) =
      open(spark, root, v).select(
        col(idCol) +: lit(true).as(s"in_$tag") +:
          compare.map(c => col(c).as(s"${c}_$tag")): _*)
    val joined = side(vA, "a").join(side(vB, "b"), Seq(idCol), "full_outer")
    val changed = compare
      .map(c => !(col(s"${c}_a") <=> col(s"${c}_b")))
      .reduce(_ || _)
    joined.withColumn("status",
        when(col("in_b").isNull, "removed")
          .when(col("in_a").isNull, "added")
          .when(changed, "changed")
          .otherwise("same"))
      .filter(col("status") =!= "same")
      .select(col(idCol) +: col("status") +:
        compare.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b"))): _*)
  }

  /** Audit sealed version `v` against the live corpus: every sealed
    * document whose text is gone (`'missing'`), no longer hashes to
    * the sealed fingerprint (`'changed'`), or was sealed WITHOUT one
    * (`'unverifiable'` — a pre-fingerprint-store row of an upgraded
    * driver dir; silently passing a row the audit cannot check would
    * turn "intact" into a lie) — the "is the corpus this training run
    * saw still reproducible" check, O(sealed) ids joined against one
    * fingerprint pass over `docs`, empty result = intact. Documents
    * added since the seal are not the snapshot's concern. */
  def verify(spark: SparkSession, root: String, v: Long, docs: DataFrame,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val live = fingerprints(docs, idCol, textCol)
      .select(col(idCol), col("fp").as("live_fp"))
    open(spark, root, v).select(col(idCol), col("fp"))
      .join(live, Seq(idCol), "left_outer")
      .withColumn("status",
        when(col("fp").isNull, "unverifiable")
          .when(col("live_fp").isNull, "missing")
          .when(col("fp") =!= col("live_fp"), "changed")
          .otherwise("ok"))
      .filter(col("status") =!= "ok")
      .select(col(idCol), col("status"), col("fp"), col("live_fp"))
  }

  /** Retention sweep, two-phase so readers keep the index families'
    * vacuum guarantee: versions `keep` rejects are first UN-PUBLISHED
    * (fresh retired marker, seal deleted — [[open]] refuses from here
    * on), and their data is deleted only once the retired marker is
    * `graceMs` old. Also sweeps crashed-create debris: unsealed
    * `snap/` dirs and `.tmp-*` markers, aged by their own mtime. */
  def gc(spark: SparkSession, root: String, keep: Long => Boolean,
         graceMs: Long = 0L): Unit =
    Lease.withLease(spark, root, "snapshot-gc") {
      val f = fsOf(spark, root)
      val now = System.currentTimeMillis()
      val sr = new Path(sealRoot(root))
      // phase 1: un-publish rejected versions (marker create is the
      // retirement timestamp; crash between the two steps leaves both
      // markers and the replay finishes the delete)
      for (v <- versions(spark, root) if !keep(v)) {
        val retired = new Path(sr, s".retired-v=$v.txt")
        val out = f.create(retired, true)
        try out.write(s"retired:$now\n".getBytes("UTF-8"))
        finally out.close()
        f.delete(sealFile(root, v), false)
      }
      // phase 2: delete data whose retirement has aged past the grace.
      // Fresh clock reading — phase 1's markers were created after
      // `now`, and a grace-0 sweep must collect them in THIS call.
      // A marker whose version is STILL SEALED is a torn phase 1 whose
      // version the current keep() re-accepted (phase 1 above would
      // have re-deleted the seal otherwise): cancel the retirement —
      // deleting the data under a live seal is never legal.
      val now2 = System.currentTimeMillis()
      if (f.exists(sr)) for (st <- f.listStatus(sr))
        st.getPath.getName match {
          case RetiredName(vs) =>
            val v = vs.toLong
            if (f.exists(sealFile(root, v))) f.delete(st.getPath, false)
            else if (now2 - st.getModificationTime >= graceMs) {
              f.delete(new Path(snapDir(root, v)), true)
              f.delete(st.getPath, false)
            }
          case n if n.startsWith(".tmp-") && n.endsWith(".txt") &&
            now2 - st.getModificationTime >= graceMs =>
            f.delete(st.getPath, false)
          case _ => ()
        }
      // crashed-create debris: snap dirs that never sealed and are not
      // mid-retirement (phase 2 owns those). Exact-name match only —
      // a torn redact leaves AtomicSwap artifacts (`v=N__new`,
      // `v=N__commit`) here that open()'s repair owns, and a loose
      // prefix parse would throw on them and abort retention forever.
      val sd = new Path(s"$root/snap")
      if (f.exists(sd)) for (st <- f.listStatus(sd))
        st.getPath.getName match {
          case SnapDirName(vs) =>
            val v = vs.toLong
            val isSealed = f.exists(sealFile(root, v))
            val retiring = f.exists(new Path(sr, s".retired-v=$v.txt"))
            if (!isSealed && !retiring &&
              now2 - st.getModificationTime >= graceMs)
              f.delete(st.getPath, true)
          case _ => ()
        }
    }

  /** Takedown cascade through sealed history: rewrite every sealed
    * version that contains a victim id WITHOUT it, in place — version
    * numbers, seal markers, and every untouched version survive, so
    * existing "run T ← snapshot N" records stay valid (minus exactly
    * the forgotten rows). Each rewrite is a crash-atomic swap; absent
    * ids are a probe-cost no-op, so the call is replay-idempotent. */
  def redact(spark: SparkSession, root: String, victims: DataFrame,
             idCol: String = "doc_id"): Unit =
    Lease.withLease(spark, root, "snapshot-redact") {
      val vIds = victims.select(col(idCol)).distinct().localCheckpoint(true)
      for (v <- versions(spark, root)) {
        val sealedRows = open(spark, root, v)
        if (!sealedRows.join(vIds, Seq(idCol), "left_semi").isEmpty)
          AtomicSwap.swap(spark, snapDir(root, v)) { tmp =>
            sealedRows.join(vIds, Seq(idCol), "left_anti").write.parquet(tmp)
          }
      }
    }
}
