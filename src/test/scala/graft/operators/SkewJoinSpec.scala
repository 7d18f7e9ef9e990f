package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture = {
    // 3 hot keys over 3000 rows, plus a key with no dim match
    val fact = (0 until 3000).map(i => (i.toLong, i % 3, i * 1.5))
      .toDF("id", "k", "v")
      .union(Seq((9999L, 7, 1.0)).toDF("id", "k", "v"))
    val dim = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "grp")
    (fact, dim)
  }

  test("salted join is row-for-row identical to the plain join") {
    val (fact, dim) = fixture
    val plain = fact.join(dim, Seq("k")).collect().map(_.toString).sorted
    for (nSalts <- Seq(1, 4, 32)) {
      val salted = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), col("id"), nSalts)
        .collect().map(_.toString).sorted
      assert(salted.sameElements(plain), s"nSalts=$nSalts changed the join result")
    }
  }

  test("null salt-source rows survive (salt is derived, never a join filter)") {
    val fact = Seq((Some(1L), 0), (None, 0)).toDF("id", "k")
    val dim = Seq((0, "a")).toDF("k", "grp")
    val out = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), col("id"), 8)
    assert(out.count() == 2)
  }

  test("salt column does not leak into the output schema") {
    val (fact, dim) = fixture
    val cols = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), col("id"), 4).columns
    assert(!cols.contains("__salt"))
    assert(cols.sorted.sameElements(fact.join(dim, Seq("k")).columns.sorted))
  }

  test("fact keys spread across nSalts sub-partitions (the point of salting)") {
    val (fact, _) = fixture
    val n = 8
    val salts = fact
      .filter(col("k") < 3) // the hot keys (k=7 is a 1-row straggler)
      .withColumn("__salt", pmod(hash(col("id")), lit(n)))
      .groupBy("k").agg(countDistinct(col("__salt")).as("d"))
      .select(min(col("d"))).as[Long].head()
    assert(salts == n, s"expected every hot key split into $n sub-keys, got $salts")
  }
}
