package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import scala.util.Random

class SimHash32Spec extends SparkSpecBase {
  import spark.implicits._

  test("kernel equals the exploded ±1 bit-vote aggregation (q33 semantics)") {
    val rng = new Random(5)
    val rows = (0 until 200).map(_ =>
      Array.fill(1 + rng.nextInt(40))(rng.nextLong().abs % 1000000007L))
    def reference(toks: Array[Long]): Long = {
      (0 until 32).map { j =>
        val votes = toks.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << j else 0L
      }.sum
    }
    val got = rows.toDF("toks")
      .select(call_function("simhash32", $"toks")).as[Long].collect()
    rows.map(reference).zip(got).foreach { case (e, g) => assert(e == g) }
  }

  test("registered in SQL; empty array hashes to 0") {
    assert(spark.sql(
      "SELECT simhash32(cast(array() as array<bigint>)) AS h").as[Long].head() == 0L)
    // single token: simhash == token's low 32 bits (every set bit wins 1>0)
    assert(spark.sql("SELECT simhash32(array(5L)) AS h").as[Long].head() == 5L)
  }
}
