package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-atomic directory replacement — the [[VecIndex]] commit-marker +
  * roll-forward discipline factored out for every whole-table swap in the
  * storage layer (the daily driver's decision table and signature index
  * re-layout; anything else that replaces a directory wholesale).
  *
  * Why delete-then-rename alone is not enough: a crash between the two
  * leaves NO live copy of the table. The marker turns the swap into a
  * two-phase commit against the filesystem:
  *
  *  1. write the replacement under `dst__new` (crash here: debris with no
  *     marker — uncommitted, the old table still serves reads);
  *  2. create the commit marker `dst__commit` (crash after: the
  *     replacement is durable — every later open rolls FORWARD);
  *  3. delete `dst`, rename `dst__new` → `dst` (crash between: repair
  *     re-drives both — each step is idempotent);
  *  4. remove the marker.
  *
  * [[repair]] is cheap (one existence probe when healthy) and must run
  * before every read of a swap-managed directory — the open-repairs
  * contract VecIndexSpec pins for the vector index and
  * DailyDriverApiSpec pins for the driver tables.
  *
  * Repair is DESTRUCTIVE (it deletes the old table once the marker is
  * durable), so it must never race the writer's own marker window or a
  * second repair: both the marker window of [[swap]] and the body of
  * [[repair]] run under a short-lived TABLE lock (`dst__lock`,
  * create-no-overwrite). The lock is held only around metadata
  * operations (seconds), never around the replacement write, so a
  * healthy reader hitting a marker waits briefly for the writer to
  * finish; a marker left by a CRASH comes with a lock whose heartbeat
  * has stopped — broken after `lockStaleMs` (default 60 s, far above
  * any healthy delete+rename) and repaired.
  *
  * Reader contract: this is a single-writer, read-RETRY discipline — a
  * reader racing the swap's delete+rename window can observe a missing
  * directory for the instant between the two renames; `repair` + retry
  * always lands on a complete table (the replacement is durable before
  * the old table is touched). Workloads that need lock-free snapshot
  * reads across mutations use the [[LexIndex]]-style versioned-manifest
  * layout instead, where published versions are immutable, readers pin
  * one, and `LexIndex.gc`'s grace window keeps a pinned version's files
  * alive until in-flight scans are done; this helper is for tables
  * swapped between protocol steps (the daily driver's), not under live
  * concurrent scans.
  */
object AtomicSwap {

  private def tmpPath(dst: String) = new Path(dst + "__new")
  private def markerPath(dst: String) = new Path(dst + "__commit")
  private def lockPath(dst: String) = new Path(dst + "__lock")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Replace `dst` with whatever `write` puts under the temp directory,
    * atomically under crashes. `write` receives the temp path and must
    * fully materialize the replacement there (e.g.
    * `df.write.parquet(tmp)` — Spark's job commit makes the directory
    * complete-or-absent). */
  def swap(spark: SparkSession, dst: String)(write: String => Unit): Unit = {
    val dstP = new Path(dst)
    val fs = fsOf(spark, dstP)
    repair(spark, dst) // finish any interrupted predecessor first
    val tmp = tmpPath(dst)
    fs.delete(tmp, true) // uncommitted debris from an earlier crash
    write(tmp.toString)
    // the marker window: metadata ops only, guarded by the table lock so
    // a concurrent reader's repair can never interleave its delete/rename
    // with ours
    withTableLock(fs, dst) {
      fs.create(markerPath(dst), false).close() // THE commit point
      fs.delete(dstP, true)
      require(fs.rename(tmp, dstP), s"swap rename failed: $tmp -> $dstP")
      fs.delete(markerPath(dst), false)
    }
  }

  /** Roll an interrupted [[swap]] forward. Marker present + tmp present →
    * the replacement is durable but unpublished: re-drive delete+rename.
    * Marker present + tmp absent → only the marker removal remained.
    * Marker absent → any tmp debris is uncommitted and stays invisible
    * (the next swap overwrites it). Idempotent — repair may itself crash
    * and re-run; serialized against the writer and other repairs by the
    * table lock (the marker is re-checked under it — a repair that
    * merely waited out a healthy writer finds it gone and does nothing).
    *
    * @param lockStaleMs age past which a lock counts as a crashed
    *                    holder's and is broken (specs shrink it)
    * @param deadlineMs  bound on waiting for a LIVE lock holder */
  def repair(spark: SparkSession, dst: String,
             lockStaleMs: Long = 60000L, deadlineMs: Long = 120000L): Unit = {
    val dstP = new Path(dst)
    val fs = fsOf(spark, dstP)
    if (!fs.exists(markerPath(dst))) return
    withTableLock(fs, dst, lockStaleMs, deadlineMs) {
      if (fs.exists(markerPath(dst))) { // re-check under the lock
        val tmp = tmpPath(dst)
        if (fs.exists(tmp)) {
          fs.delete(dstP, true)
          require(fs.rename(tmp, dstP), s"repair rename failed: $tmp -> $dstP")
        }
        fs.delete(markerPath(dst), false)
      }
    }
  }

  /** Short-lived mutual exclusion on `dst`'s metadata window: poll the
    * create-no-overwrite lock, breaking locks older than `lockStaleMs`
    * (their holder crashed mid-window — the lock carries its creation
    * millis), giving up after `deadlineMs` if a LIVE holder never
    * finishes. */
  private def withTableLock[T](fs: FileSystem, dst: String,
                               lockStaleMs: Long = 60000L,
                               deadlineMs: Long = 120000L)(body: => T): T = {
    val p = lockPath(dst)
    val deadline = System.currentTimeMillis() + deadlineMs
    var acquired = false
    while (!acquired) {
      acquired =
        try {
          val out = fs.create(p, false)
          try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
          finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (!acquired) {
        val ts = try {
          val in = fs.open(p)
          val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          s.toLong
        } catch { case _: Exception => 0L } // torn/vanished → break it
        if (System.currentTimeMillis() - ts > lockStaleMs) fs.delete(p, false)
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"table lock $p held past ${deadlineMs} ms — live holder stuck?")
        else Thread.sleep(200)
      }
    }
    try body finally fs.delete(p, false)
  }
}

/** Single-writer fencing for a storage-protocol root: a lease FILE under
  * the directory, acquired with create-no-overwrite (atomic on HDFS and
  * object stores with conditional put; best-effort on a raw local fs —
  * fine for the single-host test harness). A second writer fails FAST
  * instead of interleaving its swaps/appends with a live step.
  *
  * Staleness: a crashed writer leaves its lease behind by design — the
  * lease carries an epoch-millis heartbeat, and an acquirer may TAKE OVER
  * a lease whose NEWEST heartbeat is older than `staleMs` (default
  * 30 min). [[withLease]] RENEWS the heartbeat every `staleMs / 3` from
  * a daemon thread, so staleness means "the holder stopped beating",
  * not "the step ran long" — a legitimate multi-hour compaction stays
  * fenced while a genuinely dead writer ages out in one bound. Renewals
  * are uniquely-named sidecar files (`.lease-hb-<uuid>`, same
  * `owner|ts|nonce` body), never overwrites: a reader can at worst see
  * a torn COPY of the newest beat and fall back to the previous one, so
  * no renewal race can make a live lease look stale. Only beats whose
  * nonce matches the live lease count — debris from a fenced-out former
  * holder refreshes nothing. Takeover remains a dead-writer protocol,
  * not preemption: a writer alive-but-frozen past `staleMs` (renewal
  * thread starved too) is still taken over, and the table-level
  * [[AtomicSwap]] lock bounds that misconfiguration to loud swap
  * failures rather than silent interleaving.
  *
  * Takeover breaks the old lease by RENAMING it to a tombstone — an
  * atomic move only one contender can win — then verifies the tombstone
  * holds the stale content it based the decision on (a competitor may
  * have replaced the file between read and rename; if so the move is
  * undone and the acquire fails). Release verifies the stored nonce
  * first: a writer that lost its lease to a takeover must not delete
  * the new owner's lease.
  */
object Lease {

  final case class Token(dir: String, nonce: String)

  private def leasePath(dir: String) = new Path(dir + "/__lease")
  private val hbPrefix = ".lease-hb-"

  /** Newest parseable heartbeat for `nonce` under `dir`, or None. A
    * half-written beat parses as torn and is skipped — the previous
    * complete beat (or the lease's own ts) still stands. */
  private def newestBeat(fs: FileSystem, dir: String, nonce: String): Option[Long] = {
    val beats =
      try fs.listStatus(new Path(dir)).toSeq
        .filter(_.getPath.getName.startsWith(hbPrefix))
      catch { case _: java.io.IOException => Seq.empty }
    beats.flatMap(st => readLease(fs, st.getPath))
      .collect { case (_, ts, n) if n == nonce => ts }
      .sorted.lastOption
  }

  private def dropBeats(fs: FileSystem, dir: String, nonce: String,
                        keepNewest: Boolean): Unit = {
    val mine =
      try fs.listStatus(new Path(dir)).toSeq
        .filter(_.getPath.getName.startsWith(hbPrefix))
        .flatMap(st => readLease(fs, st.getPath)
          .collect { case (_, ts, n) if n == nonce => (ts, st.getPath) })
        .sortBy(_._1)
      catch { case _: java.io.IOException => Seq.empty }
    val victims = if (keepNewest) mine.dropRight(1) else mine
    victims.foreach { case (_, p) =>
      try fs.delete(p, false) catch { case _: java.io.IOException => () }
    }
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readLease(fs: FileSystem, p: Path): Option[(String, Long, String)] =
    try {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      new String(bytes, "UTF-8").split('|') match {
        case Array(owner, ts, nonce) => Some((owner, ts.toLong, nonce))
        case _ => None // torn write → treat as stale garbage
      }
    } catch { case _: java.io.IOException => None } // vanished under us

  private def tryCreate(fs: FileSystem, p: Path, body: String): Boolean =
    try {
      val out = fs.create(p, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException => false // raw local fs throws plain IOE
    }

  /** Acquire the writer lease for `dir` or throw `IllegalStateException`
    * naming the current holder (fail-fast — the caller's step must NOT
    * queue behind a live writer; retries are an orchestrator decision). */
  def acquire(spark: SparkSession, dir: String, owner: String,
              staleMs: Long = 30L * 60 * 1000): Token = {
    val p = leasePath(dir)
    val fs = fsOf(spark, p)
    val nonce = java.util.UUID.randomUUID().toString
    def body = s"$owner|${System.currentTimeMillis()}|$nonce"
    if (tryCreate(fs, p, body)) return Token(dir, nonce)
    readLease(fs, p) match {
      case Some((holder, ts, heldNonce))
          if System.currentTimeMillis() -
            newestBeat(fs, dir, heldNonce).getOrElse(0L).max(ts) <= staleMs =>
        throw new IllegalStateException(
          s"writer lease for $dir held by '$holder' (last beat " +
            s"${System.currentTimeMillis() -
              newestBeat(fs, dir, heldNonce).getOrElse(0L).max(ts)} ms ago); " +
            s"a step is in flight — fail-fast by contract")
      case observed => // stale, torn, or vanished: break it via tombstone
        // RENAME (atomic — only one contender moves the file aside), then
        // verify we moved the content we read: a competitor may have
        // taken over and written a FRESH lease between our read and our
        // rename, and deleting that would yield two live writers
        val tomb = new Path(dir + "/.lease-tomb-" +
          java.util.UUID.randomUUID().toString)
        val moved =
          try fs.rename(p, tomb)
          catch { case _: java.io.IOException => false }
        if (moved) {
          val tombContent = readLease(fs, tomb)
          val sameAsObserved = (tombContent, observed) match {
            case (Some((_, _, a)), Some((_, _, b))) => a == b
            case (None, None) => true // torn then, torn now
            case _ => false
          }
          if (!sameAsObserved) {
            fs.rename(tomb, p) // give the fresh lease back
            throw new IllegalStateException(
              s"writer lease for $dir lost the takeover race — another writer won")
          }
          fs.delete(tomb, false)
          // the broken holder's beat debris must not refresh anything
          observed.foreach { case (_, _, n) => dropBeats(fs, dir, n, keepNewest = false) }
        }
        // moved == false: the file vanished or a competitor renamed it
        // first — either way the create below decides the winner
        if (tryCreate(fs, p, body)) Token(dir, nonce)
        else throw new IllegalStateException(
          s"writer lease for $dir lost the takeover race — another writer won")
    }
  }

  /** Refresh `token`'s heartbeat: write a fresh uniquely-named beat
    * file, then sweep our older beats. A no-op if the lease no longer
    * carries our nonce (we were taken over — the new owner's fence must
    * stand and our debris must not refresh it). Safe to call from a
    * renewal thread: nothing is overwritten, so a concurrent reader at
    * worst ignores the half-written new beat and keeps the old one. */
  def renew(spark: SparkSession, token: Token, owner: String): Unit = {
    val p = leasePath(token.dir)
    val fs = fsOf(spark, p)
    readLease(fs, p) match {
      case Some((_, _, n)) if n == token.nonce =>
        val beat = new Path(token.dir + "/" + hbPrefix +
          java.util.UUID.randomUUID().toString)
        if (tryCreate(fs, beat,
          s"$owner|${System.currentTimeMillis()}|${token.nonce}"))
          dropBeats(fs, token.dir, token.nonce, keepNewest = true)
      case _ => () // fenced out; do not manufacture freshness
    }
  }

  /** Release `token` if still ours; a lease lost to a stale takeover is
    * left untouched (the new owner's fence must stand). Our beat files
    * are swept either way — with a foreign nonce they refresh nothing,
    * but they are garbage. */
  def release(spark: SparkSession, token: Token): Unit = {
    val p = leasePath(token.dir)
    val fs = fsOf(spark, p)
    readLease(fs, p) match {
      case Some((_, _, n)) if n == token.nonce => fs.delete(p, false)
      case _ => ()
    }
    dropBeats(fs, token.dir, token.nonce, keepNewest = false)
  }

  /** Run `body` under the `dir` writer lease, renewing the heartbeat
    * every `staleMs / 3` from a daemon thread so a long-running step is
    * never mistaken for a dead writer, and releasing on every exit
    * path. A process CRASH skips the release on purpose — the beats
    * stop, the lease ages out, and the staleness takeover reclaims it. */
  def withLease[T](spark: SparkSession, dir: String, owner: String,
                   staleMs: Long = 30L * 60 * 1000)(body: => T): T = {
    val t = acquire(spark, dir, owner, staleMs)
    val beats = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => { val th = new Thread(r, s"lease-hb-$owner"); th.setDaemon(true); th })
    val period = math.max(staleMs / 3, 25L)
    beats.scheduleAtFixedRate(
      () => try renew(spark, t, owner) catch { case _: Exception => () },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body finally {
      beats.shutdownNow()
      // drain an in-flight renew so release's beat sweep is the last word
      beats.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
      release(spark, t)
    }
  }
}
