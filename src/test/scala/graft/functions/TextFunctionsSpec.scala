package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent plain-Scala mirror of the polynomial rolling hash. */
  private def refHash(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31L + ch.toLong) % HashMod)

  test("strHash matches an independent Scala implementation") {
    val inputs = Seq("", "a", "spark", "the quick brown fox",
      "MinHash LSH 123!?", "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    val got = inputs.toDF("s").select(strHash(col("s"))).as[Long].collect()
    assert(got.toSeq == inputs.map(refHash))
  }

  test("strHash is stable under partitioning (pure per-row function)") {
    val df = spark.range(1000).select(concat(lit("doc"), col("id")).as("s"))
    val a = df.repartition(1).select(strHash(col("s"))).as[Long].collect().sorted
    val b = df.repartition(7).select(strHash(col("s"))).as[Long].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("tokens drops empty fragments from repeated/trailing spaces") {
    val got = Seq("a  b", " lead", "trail ", "", "   ", "one")
      .toDF("s").select(tokens(col("s"))).as[Seq[String]].collect()
    assert(got.toSeq == Seq(Seq("a", "b"), Seq("lead"), Seq("trail"),
      Seq(), Seq(), Seq("one")))
  }

  test("minhash parameters are pairwise distinct and cover both grains") {
    assert(MinhashA.size == MinhashWideK && MinhashB.size == MinhashWideK)
    assert(MinhashA.distinct.size == MinhashWideK)
    assert(MinhashB.distinct.size == MinhashWideK)
    // the wide banding consumes the whole array in full bands; the
    // narrow grain is a prefix of it
    assert(MinhashBands * MinhashBandRows == MinhashWideK)
    assert(MinhashK <= MinhashWideK)
    // multipliers stay below the modulus: a·x with x < p must not
    // overflow 63 bits on either engine
    assert(MinhashA.forall(a => a > 0 && a < HashMod))
  }
}
