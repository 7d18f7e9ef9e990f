package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Randomized protocol check for the IVF index: any seeded sequence of
  * append / delete / compact / retrain / compactIfDelta /
  * maintainIfSkewed must land on exactly the surviving vector set —
  * ids, embeddings, and norms — however the ops re-cell or re-version
  * the layout along the way (cids and manifest versions are layout,
  * not content). The pairwise contracts are pinned in VecIndexSpec;
  * this composes them in random orders. */
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
      // day 0 indexes chunks 1..n-1; chunk 0 stays out as APPEND feed
      VecIndex.build(emb.filter(col("vec_id") % nChunks =!= 0),
        "vec_id", "embedding", cents, dir, persistCentroids = true)
      var liveChunks = (1 until nChunks).toSet
      var appendable = Set(0)
      val trace = new StringBuilder("build")
      for (_ <- 1 to 7) {
        // widened with the gc roll so maintainIfSkewed (the else
        // branch) keeps its own slot in the sequences
        val roll = rnd.nextInt(8)
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
        } else if (roll == 3 && appendable.nonEmpty) {
          val c = appendable.head
          VecIndex.append(emb.filter(col("vec_id") % nChunks === c),
            "vec_id", "embedding",
            VecIndex.openCentroids(spark, dir).get, dir)
          appendable -= c; liveChunks += c; trace ++= s" append($c)"
        } else if (roll == 4) {
          val fired = VecIndex.compactIfDelta(spark, dir, "vec_id",
            maxDeltaShare = 0.05)
          trace ++= s" compactIfDelta($fired)"
        } else if (roll == 5) {
          // zero-grace sweep between arbitrary mutations: every cells
          // version a pruned delete's ownership chain references is
          // LIVE data — gc must keep the whole chain or the next open
          // loses untouched cells
          VecIndex.gc(spark, dir, 0L); trace ++= " gc"
        } else if (roll == 6) {
          // wholesale replacement from source (the migration
          // primitive): same surviving rows re-celled under a fresh
          // quantizer, delta epoch retired in the same publish
          val src = emb.filter(
            liveChunks.map(c => col("vec_id") % nChunks === c).reduce(_ || _))
          VecIndex.rebuild(src, "vec_id", "embedding",
            KMeans.contiguous(
              KMeans.lloyd(src, "vec_id", "embedding", k = 3, iters = 1)),
            dir)
          trace ++= " rebuild"
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
