package graft.operators

import graft.SparkSpecBase

/** Concurrency hammers for the storage-protocol primitives on the local
  * filesystem — the atomicity claims that used to be "best-effort on a
  * raw local fs" and are now NIO `CREATE_NEW` (one O_CREAT|O_EXCL
  * open(2)):
  *
  *  - N threads race [[Lease.acquire]] on a fresh directory → exactly
  *    one wins, N−1 fail fast naming the holder;
  *  - N threads race the same STALE lease's takeover → exactly one wins
  *    (the tombstone-rename + content-verify discipline);
  *  - N threads serialize a read-modify-write through the
  *    [[AtomicSwap]] table lock → no lost update, and a STALE table
  *    lock being broken by racing contenders still admits one at a time
  *    (the ADVICE race: two contenders observing the same stale
  *    timestamp must not both enter the window).
  */
class LeaseHammerSpec extends SparkSpecBase {

  private val threads = 16

  private def race[T](n: Int)(f: Int => T): Seq[T] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val futs = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = { gate.await(); f(i) }
        })
      }
      gate.countDown()
      futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("lease acquire: N concurrent racers, exactly one winner") {
    val dir = tempDir("lease-hammer")
    val results = race(threads) { i =>
      try Right(Lease.acquire(spark, dir, s"racer-$i"))
      catch { case e: IllegalStateException => Left(e.getMessage) }
    }
    val winners = results.collect { case Right(t) => t }
    assert(winners.size == 1, s"expected exactly one winner, got ${winners.size}")
    // every loser saw a live holder (fail-fast) or lost the takeover race
    assert(results.collect { case Left(m) => m }
      .forall(_.startsWith("writer lease for")))
    Lease.release(spark, winners.head)
  }

  test("stale-lease takeover: N concurrent racers, exactly one winner") {
    val dir = tempDir("lease-takeover-hammer")
    // a crashed writer's lease: created, never renewed, then aged well
    // past the racers' staleMs — while the eventual takeover winner's
    // FRESH lease stays live (staleMs is far above the race's duration,
    // so no loser can mistake the winner for a second dead holder even
    // under heavy suite load)
    val dead = Lease.acquire(spark, dir, "crashed")
    Thread.sleep(2500)
    val results = race(threads) { i =>
      try Right(Lease.acquire(spark, dir, s"taker-$i", staleMs = 1200L))
      catch { case e: IllegalStateException => Left(e.getMessage) }
    }
    val winners = results.collect { case Right(t) => t }
    assert(winners.size == 1,
      s"stale takeover must have exactly one winner, got ${winners.size}")
    assert(winners.head.nonce != dead.nonce)
    Lease.release(spark, winners.head)
  }

  test("a torn break token (breaker killed mid-write) ages out by mtime") {
    // the crash shape: a breaker died between creating the token and
    // writing its content — unparseable must mean "ages by file mtime",
    // not "blocks takeover forever"
    val dir = tempDir("lease-torn-token")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a stale lease + an EMPTY break token backdated past the breaker
    // staleness bound (60 s)
    assert(Lease.tryCreate(fs,
      new org.apache.hadoop.fs.Path(s"$dir/__lease"),
      s"crashed|${System.currentTimeMillis() - 40L * 60 * 1000}|dead-nonce"))
    val tok = new java.io.File(dir, ".lease-break")
    java.nio.file.Files.write(tok.toPath, Array.emptyByteArray)
    assert(tok.setLastModified(System.currentTimeMillis() - 120000L))
    // first acquire sweeps the aged torn token (and fails fast — a
    // breaker slot was occupied when it looked); the retry takes over
    val e = intercept[IllegalStateException](
      Lease.acquire(spark, dir, "taker"))
    assert(e.getMessage.contains("being broken"), e.getMessage)
    assert(!tok.exists(), "aged torn break token was not swept")
    val won = Lease.acquire(spark, dir, "taker")
    Lease.release(spark, won)
  }

  test("a torn table-lock break token ages out and the lock still breaks") {
    val dir = tempDir("tablelock-torn-token")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ancient stale lock + an empty break token older than lockStaleMs
    assert(Lease.tryCreate(fs,
      new org.apache.hadoop.fs.Path(s"$dir/t__lock"), "12345|dead"))
    val tok = new java.io.File(dir, "t__lock_break")
    java.nio.file.Files.write(tok.toPath, Array.emptyByteArray)
    assert(tok.setLastModified(System.currentTimeMillis() - 10000L))
    var entered = false
    AtomicSwap.withTableLock(fs, s"$dir/t", lockStaleMs = 1000L,
      deadlineMs = 30000L) { entered = true }
    assert(entered, "stale lock with a torn break token never broke")
  }

  test("table lock: read-modify-write under contention loses no update") {
    val dir = tempDir("tablelock-hammer")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val counter = new java.io.File(dir, "counter")
    java.nio.file.Files.write(counter.toPath, "0".getBytes("UTF-8"))
    // stale-break DISABLED (10-min threshold): under a loaded machine a
    // live holder can stall past the default 60 s and get broken — the
    // documented mtime-stale trade-off, exercised by its own tests
    // below. With breaks off, ANY lost update here is a real lock bug.
    race(threads) { _ =>
      AtomicSwap.withTableLock(fs, s"$dir/t", lockStaleMs = 600000L,
        deadlineMs = 600000L) {
        val v = new String(
          java.nio.file.Files.readAllBytes(counter.toPath), "UTF-8").toInt
        Thread.sleep(5) // widen the read-modify-write window
        java.nio.file.Files.write(counter.toPath,
          (v + 1).toString.getBytes("UTF-8"))
      }
    }
    val end = new String(
      java.nio.file.Files.readAllBytes(counter.toPath), "UTF-8").toInt
    assert(end == threads, s"lost updates under the table lock: $end/$threads")
  }

  test("stale table lock: racing breakers admit one contender at a time") {
    val dir = tempDir("tablelock-stale-hammer")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // forge a crashed holder's lock: ancient timestamp, dead nonce
    val lock = new org.apache.hadoop.fs.Path(s"${dir}/t__lock")
    assert(Lease.tryCreate(fs, lock, "12345|dead-nonce"))
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    // lockStaleMs far above the 5 ms bodies: the FORGED lock's ancient
    // timestamp is stale regardless, while no live contender's fresh
    // lock can age past the bound mid-window under suite load
    race(threads) { _ =>
      AtomicSwap.withTableLock(fs, s"$dir/t", lockStaleMs = 2000L,
        deadlineMs = 60000L) {
        val now = inside.incrementAndGet()
        maxInside.accumulateAndGet(now, Math.max(_, _))
        Thread.sleep(5)
        inside.decrementAndGet()
        ()
      }
    }
    assert(maxInside.get() == 1,
      s"${maxInside.get()} contenders inside the stale-broken lock window at once")
  }

  test("withLeaseWait waits out a live holder and times out loudly past the deadline") {
    val dir = tempDir("lease-wait")
    val held = Lease.acquire(spark, dir, "holder")
    try {
      // a live holder past the deadline → the bounded patience gives up
      // with the contention type (retryable by an orchestrator), and the
      // body NEVER runs under someone else's lease
      val e = intercept[Lease.LeaseHeldException] {
        Lease.withLeaseWait(spark, dir, "waiter", deadlineMs = 700L) {
          fail("body ran while another writer held the lease")
        }
      }
      assert(e.getMessage.contains("still contended"), e.getMessage)
      // release midway through the wait → the waiter acquires and runs
      // (the streaming micro-batch fence's scenario: a maintenance pass
      // finishes and the batch proceeds instead of dying)
      val releaser = new Thread(() => {
        Thread.sleep(600); Lease.release(spark, held)
      })
      releaser.start()
      val ran = Lease.withLeaseWait(spark, dir, "waiter2",
        deadlineMs = 30000L) { 42 }
      releaser.join()
      assert(ran == 42)
    } finally Lease.release(spark, held) // no-op if the releaser won
  }
}
