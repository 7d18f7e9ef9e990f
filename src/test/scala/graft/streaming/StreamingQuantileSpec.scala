package graft.streaming

import graft.SparkSpecBase
import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream≡batch contract for [[StreamOps.streamingQuantiles]]: the
  * bottom-k-by-hash sample is an order-free multiset, so after ANY
  * prefix of the stream the emitted (n_rows, m, p50, p90) equals q130's
  * batch arithmetic over that prefix BITWISE — however the prefix was
  * split into micro-batches.
  */
class StreamingQuantileSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 32

  private def ref(prefix: Seq[(String, Long, Double)])
      : Map[String, (Long, Long, Double, Double)] = {
    import graft.functions.IntOps.idiv
    prefix.toDF("g", "h", "v").groupBy($"g")
      .agg(count(lit(1)).as("n"),
        Sketches.quantileSample($"h", $"v", k).as("s"))
      .withColumn("m", size($"s").cast("long"))
      .select($"g", $"n", $"m",
        element_at($"s", idiv($"m" + 1L, lit(2L)).cast("int")),
        element_at($"s", idiv($"m" * 9L + 9L, lit(10L)).cast("int")))
      .as[(String, Long, Long, Double, Double)].collect()
      .map { case (g, n, m, p5, p9) => g -> ((n, m, p5, p9)) }.toMap
  }

  test("streaming quantiles equal the batch sketch after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new java.util.SplittableRandom(11L)
    val all = (0 until 600).map { i =>
      (Seq("x", "y")(i % 2), rnd.nextLong(TextFunctions.HashMod),
        math.exp(rnd.nextDouble() * 3))
    }
    val input = MemoryStream[(String, Long, Double)]
    val q = StreamOps.streamingQuantiles(input.toDS(), k)
      .writeStream.format("memory").queryName("qsk")
      .outputMode("update").start()
    try {
      var fed = Seq.empty[(String, Long, Double)]
      all.grouped(150).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        fed = fed ++ b
        val streamed = spark.table("qsk")
          .select($"group", $"n_rows", $"m", $"p50_est", $"p90_est")
          .as[(String, Long, Long, Double, Double)].collect()
          .map { case (g, n, m, p5, p9) => g -> ((n, m, p5, p9)) }.toMap // last wins
        assert(streamed == ref(fed),
          s"after ${fed.size} rows: streaming $streamed vs batch ${ref(fed)}")
      }
    } finally q.stop()
  }

  test("q133's drift monitor has a streaming form: per-(source, side) " +
      "quantiles off the shared sketch equal the batch sides bitwise") {
    implicit val sqlCtx = spark.sqlContext
    // the EXACT scored relation q133 aggregates (shared code — the
    // stream≡batch claim is structural), keyed source|side so one
    // streamingQuantiles run carries every monitor group
    val scored = graft.queries.CurationQ9
      .driftScored(spark, "/root/testdata/sf0.001")
      .select(concat($"source", lit("|"), $"side").as("g"), $"h", $"q")
      .as[(String, Long, Double)].collect().toSeq
    val input = MemoryStream[(String, Long, Double)]
    val q = StreamOps.streamingQuantiles(input.toDS(), k)
      .writeStream.format("memory").queryName("qdrift")
      .outputMode("update").start()
    try {
      // two "days" of arrivals — the monitor's actual cadence
      scored.grouped((scored.size + 1) / 2).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
      val streamed = spark.table("qdrift")
        .groupBy($"group")
        .agg(max(struct($"n_rows", $"m", $"p50_est", $"p90_est")).as("s"))
        .select($"group", $"s.n_rows", $"s.m", $"s.p50_est", $"s.p90_est")
        .as[(String, Long, Long, Double, Double)].collect()
        .map { case (g, n, m, p5, p9) => g -> ((n, m, p5, p9)) }.toMap
      val batch = ref(scored)
      assert(streamed == batch,
        s"streaming drift groups diverged from q133's batch sides")
      assert(streamed.keys.exists(_.endsWith("|delta")) &&
        streamed.keys.exists(_.endsWith("|corpus")),
        "fixture vacuous: a side is missing")
    } finally q.stop()
  }

  test("below-k groups report exact quantiles with duplicates kept") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val q = StreamOps.streamingQuantiles(input.toDS(), k)
      .writeStream.format("memory").queryName("qsk2")
      .outputMode("update").start()
    try {
      input.addData(Seq(("g", 1L, 4.0), ("g", 2L, 4.0)))
      q.processAllAvailable()
      input.addData(Seq(("g", 3L, 1.0), ("g", 4L, 9.0), ("g", 5L, 9.0)))
      q.processAllAvailable()
      val last = spark.table("qsk2").orderBy(desc("n_rows")).limit(1)
        .select($"n_rows", $"m", $"p50_est", $"p90_est")
        .as[(Long, Long, Double, Double)].collect().head
      // sorted sample = [1, 4, 4, 9, 9]; p50 idx 3 → 4.0, p90 idx 5 → 9.0
      assert(last == ((5L, 5L, 4.0, 9.0)), s"got $last")
    } finally q.stop()
  }
}
