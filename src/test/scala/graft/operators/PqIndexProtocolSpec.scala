package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Randomized protocol check for the persisted code table: any seeded
  * sequence of append / delete / compact / compactIfDelta / REFRESH
  * (quantizer swap mid-sequence) must land on exactly the surviving
  * ids with exactly the codes a fresh build over the survivors UNDER
  * THE CURRENT QUANTIZER would produce (codes are a pure function of
  * the pinned quantizer, so cell AND code equality is the full-content
  * claim — stronger than VecIndex's, whose re-cellings make cids
  * layout). Codes must pair with their quantizer under arbitrary
  * interleavings: every refresh is followed by an openQuant identity
  * probe, and the final equality only holds if no op ever mixed a
  * superseded quantizer's codes into the live table. The pairwise
  * contracts are pinned in PqIndexSpec; this composes them in random
  * orders. */
class PqIndexProtocolSpec extends SparkSpecBase {

  private val nChunks = 5

  test("random maintenance sequences preserve exactly the surviving codes") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the SHARED q95/q134 quantizer definition — not a spec-local copy
    val quantA = graft.queries.CurationQ3
      .ivfpqQuant(spark, "/root/testdata/sf0.001").localCheckpoint()
    // a second, structurally different quantizer for the refresh swaps
    val quantB = PqIndex.quantFrom(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid")),
      emb.select(col("vec_id"), col("embedding"),
        (col("vec_id") % 8).cast("int").as("cid")),
      "vec_id", "embedding", m = 8, k = 16, iters = 1).localCheckpoint()
    def quantRow(df: org.apache.spark.sql.DataFrame): String =
      df.collect().map(_.toString).mkString
    def codeSet(df: org.apache.spark.sql.DataFrame): Array[(Long, Int, Seq[Int])] =
      df.select(col("vec_id"), col("cid"), col("codes")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val dir = tempDir(s"pqproto$seed")
      // day 0 indexes chunks 1..n-1; chunk 0 stays out as APPEND feed
      PqIndex.build(emb.filter(col("vec_id") % nChunks =!= 0),
        "vec_id", "embedding", quantA, dir)
      var curQuant = quantA
      var liveChunks = (1 until nChunks).toSet
      var appendable = Set(0)
      val trace = new StringBuilder("build")
      def livePred = liveChunks.map(c => col("vec_id") % nChunks === c)
        .reduce(_ || _)
      for (_ <- 1 to 8) {
        val roll = rnd.nextInt(6)
        if (roll == 0 && liveChunks.size > 1) {
          val seq = liveChunks.toSeq.sorted
          val c = seq(rnd.nextInt(seq.size))
          PqIndex.delete(spark, dir, "vec_id",
            emb.filter(col("vec_id") % nChunks === c).select(col("vec_id")))
          liveChunks -= c; trace ++= s" delete($c)"
        } else if (roll == 1) {
          PqIndex.compact(spark, dir, "vec_id"); trace ++= " compact"
        } else if (roll == 2 && appendable.nonEmpty) {
          val c = appendable.head
          PqIndex.append(emb.filter(col("vec_id") % nChunks === c),
            "vec_id", "embedding", dir)
          appendable -= c; liveChunks += c; trace ++= s" append($c)"
        } else if (roll == 3) {
          // quantizer swap mid-sequence: re-encode the SURVIVORS from
          // source under the other quantizer (refresh's contract)
          curQuant = if (curQuant eq quantA) quantB else quantA
          PqIndex.refresh(emb.filter(livePred), "vec_id", "embedding",
            curQuant, dir)
          trace ++= " refresh"
          assert(quantRow(PqIndex.openQuant(spark, dir)) == quantRow(curQuant),
            s"published quantizer is not the refresh's after: $trace")
        } else if (roll == 4) {
          // zero-grace sweep between mutations: a pruned delete's
          // ownership chain keeps older cells versions LIVE — gc must
          // keep the whole chain (VecIndexProtocolSpec's rule)
          PqIndex.gc(spark, dir, 0L); trace ++= " gc"
        } else {
          val fired = PqIndex.compactIfDelta(spark, dir, "vec_id",
            maxDeltaShare = 0.05)
          trace ++= s" compactIfDelta($fired)"
        }
      }
      val freshDir = tempDir(s"pqproto$seed-fresh")
      PqIndex.build(emb.filter(livePred), "vec_id", "embedding",
        curQuant, freshDir)
      val got = codeSet(PqIndex.open(spark, dir))
      val want = codeSet(PqIndex.open(spark, freshDir))
      assert(got.length === want.length,
        s"code count diverged after: $trace (live=$liveChunks)")
      assert(got.sameElements(want),
        s"code table diverged after: $trace (live=$liveChunks)")
    }
  }
}
