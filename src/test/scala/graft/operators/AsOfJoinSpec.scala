package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def left = Seq(
    ("s1", 10L, "probe-a"), ("s1", 20L, "probe-b"), ("s1", 5L, "probe-c"),
    ("s2", 10L, "probe-d")).toDF("station", "t", "tag")

  private def right = Seq(
    ("s1", 8L, "ON"), ("s1", 15L, "OFF"), ("s1", 20L, "ON"),
    ("s3", 1L, "ON")).toDF("station", "st", "state")

  test("non-strict: state at exactly t is visible") {
    val out = AsOfJoin(left, right, Seq("station"), "t", "st", Seq("state"))
      .select($"tag", $"state").as[(String, String)].collect().toMap
    assert(out == Map("probe-a" -> "ON", "probe-b" -> "ON",
      "probe-c" -> null, "probe-d" -> null))
  }

  test("strict: state at exactly t is excluded") {
    val out = AsOfJoin(left, right, Seq("station"), "t", "st", Seq("state"),
      strict = true)
      .select($"tag", $"state").as[(String, String)].collect().toMap
    assert(out("probe-b") == "OFF") // the t=20 ON row no longer visible
    assert(out("probe-a") == "ON")
  }

  test("result is partition-count independent") {
    val a = AsOfJoin(left.repartition(1), right.repartition(1),
      Seq("station"), "t", "st", Seq("state"))
      .select($"tag", $"state").as[(String, String)].collect().sorted.toSeq
    val b = AsOfJoin(left.repartition(5), right.repartition(3),
      Seq("station"), "t", "st", Seq("state"))
      .select($"tag", $"state").as[(String, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("ties within the right side resolve by the tiebreak column") {
    val r2 = Seq(("s1", 10L, 1L, "FIRST"), ("s1", 10L, 2L, "SECOND"))
      .toDF("station", "st", "seq", "state")
    val out = AsOfJoin(left, r2, Seq("station"), "t", "st", Seq("state"),
      tiebreak = Some(("t", "seq")))
      .filter($"tag" === "probe-a").select($"state").as[String].head()
    assert(out == "SECOND") // latest by tiebreak order wins
  }
}
