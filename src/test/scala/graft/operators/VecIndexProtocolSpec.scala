package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Randomized protocol check for the IVF index: any seeded sequence of
  * delete / compact / retrain / maintainIfSkewed must preserve exactly
  * the surviving vector set — ids, embeddings, and norms — however the
  * ops re-cell the layout along the way (cids are layout, not content).
  * The pairwise contracts are pinned in VecIndexSpec; this composes
  * them in random orders. */
class VecIndexProtocolSpec extends SparkSpecBase {

  private val nChunks = 5

  test("random maintenance sequences preserve exactly the surviving vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def vecSet(df: org.apache.spark.sql.DataFrame): Array[(Long, Seq[Float])] =
      df.select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    for (seed <- Seq(7, 19)) {
      val rnd = new scala.util.Random(seed)
      val dir = tempDir(s"vecproto$seed")
      val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
      VecIndex.build(emb, "vec_id", "embedding", cents, dir)
      var liveChunks = (0 until nChunks).toSet
      val trace = new StringBuilder("build")
      for (_ <- 1 to 6) {
        val roll = rnd.nextInt(4)
        if (roll == 0 && liveChunks.size > 1) {
          val seq = liveChunks.toSeq.sorted
          val c = seq(rnd.nextInt(seq.size))
          VecIndex.delete(spark, dir, "vec_id",
            emb.filter(col("vec_id") % nChunks === c).select(col("vec_id")))
          liveChunks -= c; trace ++= s" delete($c)"
        } else if (roll == 1) {
          VecIndex.compact(spark, dir, "vec_id"); trace ++= " compact"
        } else if (roll == 2) {
          VecIndex.retrain(spark, dir, "vec_id", "embedding", k = 4, iters = 1)
          trace ++= " retrain"
        } else {
          val fired = VecIndex.maintainIfSkewed(spark, dir, "vec_id",
            "embedding", k = 4, maxCellShare = 0.6, iters = 1)
          trace ++= s" maintain($fired)"
        }
      }
      val want = vecSet(emb.filter(
        liveChunks.map(c => col("vec_id") % nChunks === c).reduce(_ || _)))
      val got = vecSet(VecIndex.open(spark, dir))
      assert(got.length === want.length,
        s"vector count diverged after: $trace (live=$liveChunks)")
      assert(got.sameElements(want),
        s"vector set diverged after: $trace (live=$liveChunks)")
      // the layout the sequence left behind is still a valid index: a
      // probe of every cell returns each vector exactly once (no
      // duplicates across base/delta after arbitrary re-celling)
      val ids = VecIndex.open(spark, dir).groupBy(col("vec_id")).count()
        .filter(col("count") > 1).count()
      assert(ids === 0L, s"duplicated vectors after: $trace")
    }
  }
}
