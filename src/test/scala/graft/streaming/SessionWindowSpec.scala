package graft.streaming

import java.sql.Timestamp
import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the `session_window` semantics q127 and
  * [[StreamOps.streamingSessionize]] rely on:
  *
  * 1. the boundary contract — two events exactly `gap` apart DO merge
  *    (Spark merges when the next event touches the closed [ts, ts+gap]
  *    bound; a session breaks only on a strictly greater gap), which is
  *    what licenses the oracle's `<= gap` same-session rule;
  * 2. streaming ≡ batch — the watermarked streaming aggregation emits
  *    exactly the batch plan's rows once sessions close.
  */
class SessionWindowSpec extends SparkSpecBase {
  import spark.implicits._

  private val gapSec = 600L

  private def batchSessions(rows: Seq[(Long, Long, Long)]) =
    rows.map { case (u, sec, c) => (u, new Timestamp(sec * 1000), c) }
      .toDF("user_id", "ts", "cents")
      .groupBy($"user_id", session_window($"ts", s"$gapSec seconds"))
      .agg(min(unix_micros($"ts")).as("start_us"),
        max(unix_micros($"ts")).as("end_us"),
        count(lit(1)).as("n_events"), sum($"cents").as("v_cents"))
      .select($"user_id", $"start_us", $"end_us", $"n_events", $"v_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("gap boundary: exactly-gap-apart merges; one microsecond over breaks") {
    // user 1: events at 0 and exactly 600 s — ONE session (inclusive bound)
    // user 2: events at 0 and 600.000001 s — two sessions
    val got = batchSessions(Seq((1L, 0L, 10L), (1L, 600L, 20L))) ++ {
      val us = Seq((2L, new Timestamp(0L), 1L),
        (2L, Timestamp.from(java.time.Instant.ofEpochSecond(600L, 1000L)), 2L))
      us.toDF("user_id", "ts", "cents")
        .groupBy($"user_id", session_window($"ts", s"$gapSec seconds"))
        .agg(min(unix_micros($"ts")).as("start_us"),
          max(unix_micros($"ts")).as("end_us"),
          count(lit(1)).as("n_events"), sum($"cents").as("v_cents"))
        .select($"user_id", $"start_us", $"end_us", $"n_events", $"v_cents")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    }
    assert(got == Set(
      (1L, 0L, 600000000L, 2L, 30L),
      (2L, 0L, 0L, 1L, 1L),
      (2L, 600000001L, 600000001L, 1L, 2L)), s"got $got")
  }

  test("chained events extend a session past one gap from its start") {
    // 0, 500, 1000: each pair under the gap, total span > gap — one session
    val got = batchSessions(Seq((1L, 0L, 1L), (1L, 500L, 1L), (1L, 1000L, 1L)))
    assert(got == Set((1L, 0L, 1000000000L, 3L, 3L)), s"got $got")
  }

  test("streamingSessionize emits the batch plan's rows once the watermark closes sessions") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val events = Seq(
      (7L, 100L, 5L), (7L, 400L, 6L), (7L, 2000L, 7L), // two sessions
      (8L, 150L, 1L), (8L, 151L, 1L))                  // one session
    val input = MemoryStream[(Long, Timestamp, Long)]
    val out = StreamOps.streamingSessionize(
      input.toDF().toDF("user_id", "ts", "cents"),
      "ts", "user_id", "cents", gapSec, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      input.addData(events.map { case (u, s, c) => (u, ts(s), c) })
      q.processAllAvailable()
      // advance the watermark far past every session's close
      input.addData(Seq((99L, ts(100000L), 0L)))
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .filter($"user_id" =!= 99L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = batchSessions(events)
      assert(streamed == batch,
        s"streaming rows $streamed diverge from batch $batch")
    } finally q.stop()
  }
}
