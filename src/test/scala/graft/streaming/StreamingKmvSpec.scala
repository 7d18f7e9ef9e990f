package graft.streaming

import graft.SparkSpecBase
import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream≡batch contract for [[StreamOps.streamingCardinality]]:
  * the min-k distinct set is order-free, so after ANY prefix of the
  * stream the emitted sketch equals the batch aggregator over that
  * prefix bitwise — regardless of how the prefix was split into
  * micro-batches.
  */
class StreamingKmvSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 32

  test("streaming sketch equals the batch sketch after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new java.util.SplittableRandom(7L)
    val all = (0 until 600).map { i =>
      (Seq("x", "y")(i % 2), rnd.nextLong(TextFunctions.HashMod))
    }
    val batches = all.grouped(200).toSeq

    val input = MemoryStream[(String, Long)]
    val out = StreamOps.streamingCardinality(input.toDS(), k)
    val q = out.writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    // batch reference sketch over a prefix of the data
    def ref(prefix: Seq[(String, Long)]): Map[String, (Long, Long, Double)] =
      prefix.toDF("g", "h").groupBy($"g")
        .agg(Sketches.kmvMinK($"h", k).as("mins"))
        .select($"g", size($"mins").cast("long"),
          element_at($"mins", size($"mins")),
          when(size($"mins") < k, size($"mins").cast("double"))
            .otherwise(lit((k - 1) * TextFunctions.HashMod).cast("double") /
              element_at($"mins", size($"mins")).cast("double")))
        .as[(String, Long, Long, Double)].collect()
        .map { case (g, n, h, e) => g -> ((n, h, e)) }.toMap

    try {
      var fed = Seq.empty[(String, Long)]
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        fed = fed ++ b
        // last emission per group so far (memory sink appends in order)
        val streamed = spark.table("kmv")
          .select($"group", $"n_min", $"h_k", $"est_distinct")
          .as[(String, Long, Long, Double)].collect()
          .map { case (g, n, h, e) => g -> ((n, h, e)) }.toMap // last wins
        assert(streamed == ref(fed),
          s"after ${fed.size} rows: streaming $streamed vs batch ${ref(fed)}")
      }
    } finally q.stop()
  }

  test("duplicates across micro-batches do not inflate the sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = StreamOps.streamingCardinality(input.toDS(), k)
    val q = out.writeStream.format("memory").queryName("kmv2")
      .outputMode("update").start()
    try {
      input.addData(Seq(("g", 5L), ("g", 3L)))
      q.processAllAvailable()
      input.addData(Seq(("g", 5L), ("g", 3L), ("g", 9L))) // re-sends + one new
      q.processAllAvailable()
      val last = spark.table("kmv2").orderBy(desc("n_min")).limit(1)
        .select($"n_min", $"h_k", $"est_distinct")
        .as[(Long, Long, Double)].collect().head
      assert(last == ((3L, 9L, 3.0)), s"got $last")
    } finally q.stop()
  }
}
