package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpecBase {
  import spark.implicits._

  test("joining two tables bucketed on the key plans with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed")
    val a = (0L until 2000L).map(i => (i, i * 3)).toDF("id", "va")
    val b = (0L until 2000L).map(i => (i, i % 7)).toDF("id", "vb")
    Bucketed.write(a, "graft_bkt_a", "id", 8, dir.resolve("a").toString)
    Bucketed.write(b, "graft_bkt_b", "id", 8, dir.resolve("b").toString)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the layout, not the size, decides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.read(spark, "graft_bkt_a")
        .join(Bucketed.read(spark, "graft_bkt_b"), "id")
      assert(joined.count() == 2000)
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the shuffle was paid at write time — the join itself
      // must not exchange either side
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
