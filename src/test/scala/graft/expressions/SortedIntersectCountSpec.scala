package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import scala.util.Random

class SortedIntersectCountSpec extends SparkSpecBase {
  import spark.implicits._

  test("merge count equals size(array_intersect) on random sorted-distinct arrays") {
    val rng = new Random(7)
    val rows = (0 until 300).map { _ =>
      def arr = Array.fill(rng.nextInt(40))(rng.nextInt(60).toLong)
        .distinct.sorted
      (arr, arr.map(_ => ()).length.toLong, Array.fill(rng.nextInt(40))(rng.nextInt(60).toLong)
        .distinct.sorted)
    }.map { case (a, _, b) => (a, b) }
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("sorted_intersect_count", $"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin")).as[(Int, Int)].collect()
    got.foreach { case (n, b) => assert(n == b) }
  }

  test("probe path (asymmetric sizes) equals size(array_intersect)") {
    // sizes differ by ≥ 32× in both directions, driving the binary-search
    // path; includes duplicates-of-boundary and all-miss cases
    val rng = new Random(11)
    val rows = (0 until 200).map { _ =>
      val small = Array.fill(1 + rng.nextInt(5))(rng.nextInt(5000).toLong)
        .distinct.sorted
      val large = Array.fill(2000 + rng.nextInt(1000))(rng.nextInt(5000).toLong)
        .distinct.sorted
      if (rng.nextBoolean()) (small, large) else (large, small)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("sorted_intersect_count", $"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin")).as[(Int, Int)].collect()
    got.foreach { case (n, b) => assert(n == b) }
    // degenerate probes: small entirely below / above the large range
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(-5L), sequence(1L, 200L)) AS c")
      .as[Int].head() == 0)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(999L), sequence(1L, 200L)) AS c")
      .as[Int].head() == 0)
  }

  test("registered in SQL; empty and disjoint inputs") {
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c")
      .as[Int].head() == 2)
    assert(spark.sql(
      "SELECT sorted_intersect_count(cast(array() as array<bigint>), array(1L)) AS c")
      .as[Int].head() == 0)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L), array(2L)) AS c")
      .as[Int].head() == 0)
  }
}
