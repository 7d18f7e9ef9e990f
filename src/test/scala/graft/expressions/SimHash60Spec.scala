package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import scala.util.Random

class SimHash60Spec extends SparkSpecBase {
  import spark.implicits._

  test("kernel equals the exploded ±1 bit-vote aggregation over 60 bits") {
    val rng = new Random(7)
    // 60-bit fingerprints, the h1·2³⁰ + h2 form the query builds
    val rows = (0 until 200).map(_ =>
      Array.fill(1 + rng.nextInt(40))(
        (rng.nextLong().abs % 1000000007L) * 1073741824L +
          rng.nextLong().abs % 998244353L))
    def reference(toks: Array[Long]): Long = {
      (0 until 60).map { j =>
        val votes = toks.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << j else 0L
      }.sum
    }
    val got = rows.toDF("toks")
      .select(call_function("simhash60", $"toks")).as[Long].collect()
    rows.map(reference).zip(got).foreach { case (e, g) => assert(e == g) }
  }

  test("poly_hash2 is independent of poly_hash and SQL-registered") {
    val pairs = spark.sql(
      "SELECT poly_hash('spark shuffle') AS h1, poly_hash2('spark shuffle') AS h2")
      .as[(Long, Long)].head()
    assert(pairs._1 != pairs._2)
    assert(pairs._2 < 998244353L && pairs._2 >= 0L)
    // 60-bit composition stays below 2^60
    assert(pairs._1 * 1073741824L + pairs._2 < (1L << 60))
  }

  test("single token: simhash60 == the token's low 60 bits") {
    val tok = 987654321L * 1073741824L + 123456789L
    assert(spark.sql(s"SELECT simhash60(array(${tok}L)) AS h")
      .as[Long].head() == tok)
  }
}
