package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import scala.util.Random

class FloatDotSpec extends SparkSpecBase {
  import spark.implicits._

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0.0 as double), (acc, x) -> acc + x)")

  test("native expression is bitwise equal to the sequential HOF fold") {
    val rng = new Random(11)
    val rows = (0 until 300).map { _ =>
      val n = 1 + rng.nextInt(64)
      (Array.fill(n)(rng.nextFloat() * 2 - 1), Array.fill(n)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("float_dot", $"a", $"b").as("native"),
      hofDot.as("fold")).as[(Double, Double)].collect()
    got.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(f))
    }
  }

  test("registered in SQL; empty arrays give 0; mismatched lengths give null") {
    val r = spark.sql(
      "SELECT float_dot(array(cast(1.5 as float), cast(2.0 as float)), " +
        "array(cast(2.0 as float), cast(-1.0 as float))) AS d").as[Double].head()
    assert(r == 1.0)
    val empty = spark.sql(
      "SELECT float_dot(cast(array() as array<float>), cast(array() as array<float>)) AS d")
      .as[Double].head()
    assert(empty == 0.0)
    val mism = spark.sql(
      "SELECT float_dot(array(cast(1.0 as float)), cast(array() as array<float>)) AS d")
      .as[Option[Double]].head()
    assert(mism.isEmpty)
  }

  test("stays inside whole-stage codegen over the embeddings scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = emb.select(call_function("float_dot", $"embedding", $"embedding").as("d"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("float_dot"), plan)
    assert(out.filter($"d" >= 0).count() > 0)
  }
}
