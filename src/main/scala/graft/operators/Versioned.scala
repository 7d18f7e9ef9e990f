package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The versioned-manifest publication protocol shared by the
  * vector-family indexes ([[VecIndex]], [[PqIndex]]) — the [[LexIndex]]
  * discipline factored for layouts whose bulk side is rewritten whole:
  * mutations write fresh `v=N+1` directories the live index never
  * references, then publish ONE manifest file via an atomic
  * same-directory rename. A crash before the rename leaves invisible
  * debris the replay overwrites; readers resolve the manifest once and
  * get pinned snapshots over immutable paths.
  *
  * Manifest content is the (base, epoch, cents) triple: the bulk cells
  * version (0 = none), the current append epoch, and the quantizer
  * version (0 = none — VecIndex's coarse centroids, PqIndex's
  * coarse+codebook row). The unpublished default is epoch 1, so a
  * pure-stream index has a well-defined append target without a
  * manifest write a streaming sink could not make transactional.
  */
private[operators] object Versioned {

  final case class Man(v: Long, base: Long, epoch: Long, cents: Long)

  private val ManifestName = "v=(\\d+)\\.txt".r

  def manifestDir(path: String): String = s"$path/manifest"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currentVersion(spark: SparkSession, path: String): Long = {
    val dir = new Path(manifestDir(path))
    val f = fs(spark, path)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case ManifestName(v) => v.toLong }
      .foldLeft(0L)(math.max)
  }

  def current(spark: SparkSession, path: String): Man = {
    val v = currentVersion(spark, path)
    if (v == 0L) return Man(0L, 0L, 1L, 0L)
    val in = fs(spark, path).open(new Path(manifestDir(path), s"v=$v.txt"))
    val kv =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { line =>
          val Array(k, value) = line.split(":")
          k -> value.toLong
        }.toMap
      finally in.close()
    Man(v, kv.getOrElse("base", 0L), kv.getOrElse("epoch", 1L),
      kv.getOrElse("cents", 0L))
  }

  /** Publish manifest version `v`: write to a dot-prefixed temp name in
    * the manifest directory, then rename — one atomic same-directory
    * move, the only step that changes what readers see. The rename goes
    * through [[Lease.atomicRename]]: this is THE atomic step of every
    * index family, and on `file:` URIs Hadoop's local rename falls back
    * to copy+delete when `renameTo` fails — the exact hole the lease
    * layer routes around with NIO `ATOMIC_MOVE` (one rename(2), never a
    * copy a reader could observe half-written). */
  def publish(spark: SparkSession, path: String, v: Long, base: Long,
              epoch: Long, cents: Long): Unit = {
    val f = fs(spark, path)
    val dir = new Path(manifestDir(path))
    f.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-v=$v.txt")
    val out = f.create(tmp, true)
    try out.write(s"base:$base\nepoch:$epoch\ncents:$cents\n".getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, s"v=$v.txt")
    f.delete(dst, false) // only present if THIS version was already published
    require(Lease.atomicRename(f, tmp, dst),
      s"manifest publish failed: $tmp -> $dst")
  }

  /** Whether a side directory holds actual cell partitions: an EMPTY
    * write (a zero-row batch append, a delete that emptied the index)
    * leaves a bare directory with just _SUCCESS, and scanning that
    * fails parquet schema inference instead of reading as zero rows —
    * the shared guard [[VecIndex]]/[[PqIndex]] open through. A
    * stream-governed delta epoch nests its cells one level down
    * (`b=B/cid=N` — the per-micro-batch replay-overwrite key), so a
    * `b=` child counts when IT holds cells. */
  def hasCells(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(p) && f.listStatus(p).exists { st =>
      val n = st.getPath.getName
      n.startsWith("cid=") || (n.startsWith("b=") &&
        f.listStatus(st.getPath).exists(_.getPath.getName.startsWith("cid=")))
    }
  }

  /** The grace-aging rule for gc sweeps, SUPERSESSION-bounded: a
    * directory is collectible only when both its own mtime and the
    * current manifest file's mtime (the lower bound on when anything
    * unreferenced was retired) are older than `graceMs` — a reader's
    * pin strictly precedes the publish that supersedes its version, so
    * deletion implies a full grace since the pin (see [[VecIndex.gc]]).
    * Returns the predicate over a candidate's mtime. */
  def agedRule(spark: SparkSession, path: String, curV: Long,
               graceMs: Long, now: Long): Long => Boolean = {
    val bound =
      try fs(spark, path)
        .getFileStatus(new Path(manifestDir(path), s"v=$curV.txt"))
        .getModificationTime
      catch { case _: java.io.IOException => now }
    (mtime: Long) => now - math.max(mtime, bound) >= graceMs
  }

  /** Sweep a `prefix`-versioned directory family, deleting entries the
    * keep-rule rejects once aged; then sweep superseded manifest files
    * themselves. */
  def gcSweep(spark: SparkSession, path: String, m: Man, graceMs: Long,
              families: Seq[(String, String, Long => Boolean)]): Unit = {
    val f = fs(spark, path)
    val now = System.currentTimeMillis()
    val aged = agedRule(spark, path, m.v, graceMs, now)
    for ((dir, prefix, keep) <- families) {
      val d = new Path(dir)
      if (f.exists(d))
        for (st <- f.listStatus(d) if st.getPath.getName.startsWith(prefix)) {
          val v = st.getPath.getName.stripPrefix(prefix).toLong
          if (!keep(v) && aged(st.getModificationTime))
            f.delete(st.getPath, true)
        }
    }
    val md = new Path(manifestDir(path))
    if (f.exists(md)) for (st <- f.listStatus(md)) st.getPath.getName match {
      case ManifestName(v) if v.toLong != m.v &&
        aged(st.getModificationTime) => f.delete(st.getPath, false)
      // a publish that crashed between the tmp write and the rename
      // strands `.tmp-v=N.txt`: a same-version replay overwrites it,
      // but a crashed version-N publish followed by a successful N+1
      // never revisits the name — sweep the aged debris here (the aged
      // rule keeps an in-flight publish's seconds-old tmp safe, and gc
      // runs under the writer lease so no publish races the sweep)
      case n if n.startsWith(".tmp-v=") && n.endsWith(".txt") &&
        aged(st.getModificationTime) => f.delete(st.getPath, false)
      case _ => ()
    }
  }
}
