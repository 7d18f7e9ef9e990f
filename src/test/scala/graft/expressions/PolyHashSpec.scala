package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import scala.util.Random

class PolyHashSpec extends SparkSpecBase {
  import spark.implicits._

  test("native expression equals the Column-algebra form on ASCII corpus") {
    val rng = new Random(3)
    val strs = Seq("", "a", "hello world", "x" * 500) ++
      (0 until 200).map(_ => rng.alphanumeric.take(rng.nextInt(80)).mkString)
    val df = strs.toDF("s")
    val both = df.select(
      TextFunctions.strHash($"s").as("native"),
      TextFunctions.strHashColumnAlgebra($"s").as("algebraic"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, a) => assert(n == a) }
  }

  test("poly_hash is registered as a SQL function via GraftExtensions") {
    val got = spark.sql("SELECT poly_hash('spark') AS h").as[Long].head()
    val expected = "spark".foldLeft(0L)((acc, ch) => (acc * 31 + ch) % PolyHash.Mod)
    assert(got == expected)
  }

  test("expression survives whole-stage codegen on a real scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(TextFunctions.strHash($"text").as("h"))
    // the generated plan must not fall back to interpreted projection —
    // "*(n)" marks a WholeStageCodegen stage in the simple plan string
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("poly_hash"), plan)
    assert(out.distinct().count() > 0)
  }

  test("null input yields null, empty string yields 0") {
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
    val got = df.select(TextFunctions.strHash($"s")).as[Option[Long]].collect()
    assert(got(1).isEmpty)
    assert(got(2).contains(0L))
  }
}
