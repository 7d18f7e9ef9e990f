package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IslandsSpec extends SparkSpecBase {
  import spark.implicits._

  /** The naive single-window reference form (what the oracle SQL does). */
  private def globalForm(keys: DataFrame): Set[(Long, Long, Long)] = {
    val w = Window.orderBy(col("k"))
    val ws = w.rowsBetween(Window.unboundedPreceding, 0)
    keys
      .withColumn("gap", when(col("k") - lag(col("k"), 1).over(w) === 1, 0).otherwise(1))
      .withColumn("island", sum(col("gap")).over(ws))
      .groupBy(col("island"))
      .agg(min(col("k")).as("s"), max(col("k")).as("e"), count(lit(1)).as("n"))
      .select(col("s"), col("e"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def twoLevel(keys: DataFrame, bucket: Long): Set[(Long, Long, Long)] =
    Islands.consecutive(keys, "k", bucket)
      .as[(Long, Long, Long)].collect().toSet

  test("two-level islands match the global-window form on random key sets") {
    val rnd = new scala.util.Random(42)
    (0 until 4).foreach { trial =>
      val keys = (0 until 500).filter(_ => rnd.nextInt(3) > 0).map(_.toLong)
      val df = keys.toDF("k")
      // bucket sizes chosen to force many boundary chains, incl. size 1
      Seq(1L, 7L, 16L, 4096L).foreach { b =>
        assert(twoLevel(df, b) === globalForm(df),
          s"trial $trial bucket $b diverged from the global form")
      }
    }
  }

  test("negative keys (hash-id range) match the global form across bucket edges") {
    val rnd = new scala.util.Random(7)
    val keys = (-300 until 200).filter(_ => rnd.nextInt(3) > 0).map(_.toLong)
    val df = keys.toDF("k")
    Seq(7L, 16L).foreach { b =>
      assert(twoLevel(df, b) === globalForm(df), s"bucket $b diverged")
    }
    // runs straddling zero and negative bucket boundaries merge
    val straddle = (-10L to 10L).toDF("k")
    assert(twoLevel(straddle, 8) === Set((-10L, 10L, 21L)))
  }

  test("a run spanning several whole buckets chain-merges into one island") {
    val df = ((30L to 70L) ++ Seq(100L)).toDF("k")
    assert(twoLevel(df, 8) === Set((30L, 70L, 41L), (100L, 100L, 1L)))
  }

  test("single keys sitting exactly on bucket edges stay separate islands") {
    val df = Seq(8L, 16L, 24L).toDF("k") // each alone on a boundary slot
    assert(twoLevel(df, 8) === Set((8L, 8L, 1L), (16L, 16L, 1L), (24L, 24L, 1L)))
  }

  test("adjacent boundary keys in different buckets merge") {
    val df = Seq(7L, 8L).toDF("k")
    assert(twoLevel(df, 8) === Set((7L, 8L, 2L)))
  }

  test("empty key set yields no islands") {
    assert(twoLevel(Seq.empty[Long].toDF("k"), 8) === Set.empty)
  }
}
