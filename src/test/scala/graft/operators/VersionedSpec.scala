package graft.operators

import graft.SparkSpecBase
import org.apache.hadoop.fs.Path

/** The shared manifest protocol's own contracts, independent of any one
  * index family: the publish rename is atomic under concurrent readers
  * (a reader never parses a torn manifest), and a publish that CRASHED
  * between writing its `.tmp-v=N.txt` and the rename leaves debris that
  * gc sweeps once aged — while a fresh (possibly in-flight) tmp and the
  * current manifest survive every sweep.
  */
class VersionedSpec extends SparkSpecBase {

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a crashed publish's .tmp manifest debris is swept once aged") {
    val dir = tempDir("versioned-tmp")
    Versioned.publish(spark, dir, 1L, base = 1L, epoch = 1L, cents = 0L)
    // the crash shape: version 2's publish died between the tmp write
    // and the rename; version 3 then published successfully — nothing
    // ever revisits the v=2 tmp name
    val orphan = new java.io.File(s"$dir/manifest/.tmp-v=2.txt")
    java.nio.file.Files.write(orphan.toPath,
      "base:2\nepoch:1\ncents:0\n".getBytes("UTF-8"))
    Versioned.publish(spark, dir, 3L, base = 3L, epoch = 2L, cents = 0L)
    // a FRESH tmp (a publish in flight right now) must survive a graced
    // sweep; the backdated orphan must go
    val fresh = new java.io.File(s"$dir/manifest/.tmp-v=4.txt")
    java.nio.file.Files.write(fresh.toPath, "base:4\n".getBytes("UTF-8"))
    assert(orphan.setLastModified(System.currentTimeMillis() - 120000L))
    // the aged rule is supersession-bounded: nothing is collectible
    // while the CURRENT manifest is younger than the grace — model time
    // having passed since v=3's publish
    assert(new java.io.File(s"$dir/manifest/v=3.txt")
      .setLastModified(System.currentTimeMillis() - 120000L))
    val m = Versioned.current(spark, dir)
    assert(m.v == 3L && m.base == 3L && m.epoch == 2L)
    Versioned.gcSweep(spark, dir, m, graceMs = 60000L, families = Seq.empty)
    assert(!orphan.exists(), "aged crashed-publish tmp debris not swept")
    assert(fresh.exists(), "sweep deleted a fresh in-flight publish tmp")
    assert(Versioned.current(spark, dir).v == 3L,
      "sweep perturbed the current manifest")
    // grace 0 = the offline rule: everything superseded goes at once
    Versioned.gcSweep(spark, dir, m, graceMs = 0L, families = Seq.empty)
    assert(!fresh.exists(), "offline sweep left tmp debris")
    assert(new java.io.File(s"$dir/manifest/v=3.txt").exists())
  }

  test("publish hammer: concurrent readers never observe a torn manifest") {
    val dir = tempDir("versioned-hammer")
    val fs = fsOf(dir)
    val writers = 8
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers + 2)
    try {
      val readers = (0 until 2).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = while (!stop.get()) {
            try {
              val m = Versioned.current(spark, dir)
              // each publish writes base = epoch = cents = v: any mix
              // of versions or a partial read is a torn observation
              if (m.v != 0L && (m.base != m.v || m.epoch != m.v || m.cents != m.v))
                torn.compareAndSet(null, s"inconsistent triple: $m")
            } catch {
              case e: Exception =>
                torn.compareAndSet(null, s"reader threw: ${e.getMessage}")
            }
          }
        })
      }
      // each writer owns a disjoint version stripe (publishes are
      // lease-serialized in production; the hammer stresses only the
      // reader-facing atomicity of the rename itself)
      val futs = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            for (i <- 0 until 25) {
              val v = (i * writers + w + 1).toLong
              Versioned.publish(spark, dir, v, base = v, epoch = v, cents = v)
            }
        })
      }
      futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      stop.set(true)
      readers.foreach(_.get(10, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(torn.get() == null, String.valueOf(torn.get()))
    assert(Versioned.currentVersion(spark, dir) == 25L * writers)
    assert(!fs.listStatus(new Path(s"$dir/manifest"))
      .exists(_.getPath.getName.startsWith(".tmp-")),
      "completed publishes left tmp debris")
  }

  test("racing stale-token sweepers: a fresh token is never deleted") {
    // the ADVICE race, distilled: the token path holds a FRESH breaker's
    // token, but a slow sweeper still holds the STALE content it based
    // its delete decision on — the tombstone discipline must notice the
    // content changed and restore, never silently remove the fresh token
    val dir = tempDir("token-sweep")
    val fs = fsOf(dir)
    val tok = new Path(s"$dir/.lease-break")
    val stale = s"${System.currentTimeMillis() - 120000L}|old-nonce"
    val freshBody = s"${System.currentTimeMillis()}|new-nonce"
    assert(Lease.tryCreate(fs, tok, freshBody))
    // sweeper acts on its STALE observation against the fresh token
    Lease.sweepStaleToken(fs, tok, Some(stale))
    assert(Lease.readRawBytes(fs, tok).contains(freshBody),
      "stale-observation sweep removed a fresh break token")
    // and a sweep whose observation matches removes the token
    Lease.sweepStaleToken(fs, tok, Some(freshBody))
    assert(Lease.readRawBytes(fs, tok).isEmpty, "matching sweep left the token")
  }
}
