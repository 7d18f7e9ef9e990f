package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized protocol check for the versioned LexIndex: any seeded
  * sequence of merge / delete / compact / gc over disjoint document
  * chunks must leave an index row- and stats-identical to a FRESH BUILD
  * over exactly the surviving documents. The pairwise equivalences
  * (merge ≡ union build, delete ≡ reverse merge, compact/gc ≡ identity)
  * are pinned individually in LexIndexSpec; this spec composes them in
  * random orders so no op's correctness can depend on which mutations
  * came before it. */
class LexIndexProtocolSpec extends SparkSpecBase {

  private val nChunks = 6

  private def chunks(): Map[Int, DataFrame] = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    (0 until nChunks)
      .map(i => i -> docs.filter(col("doc_id") % nChunks === i)).toMap
  }

  private def rows(p: String): Array[String] =
    LexIndex.openPostings(spark, p)
      .select("term", "doc_id", "tf", "dl", "df", "tb")
      .collect().map(_.toString).sorted

  private def statsOf(p: String): Array[String] =
    LexIndex.stats(spark, p).collect().map(_.toString)

  test("random op sequences equal a fresh build over the survivors") {
    val parts = chunks()
    def tf(ids: Set[Int]): DataFrame =
      UnigramLm.termFreq(
        ids.toSeq.sorted.map(parts).reduce(_.union(_)), "doc_id", "text")
    def pick(rnd: scala.util.Random, s: Set[Int]): Int = {
      val seq = s.toSeq.sorted
      seq(rnd.nextInt(seq.size))
    }
    for (seed <- Seq(11, 23)) {
      val rnd = new scala.util.Random(seed)
      val p = tempDir(s"lexproto$seed")
      var live = Set(0) // build starts from chunk 0
      var retired = Set.empty[Int] // never re-merge a deleted chunk
      LexIndex.build(tf(live), p)
      val trace = new StringBuilder("build(0)")
      for (_ <- 1 to 8) {
        val unmerged = (0 until nChunks).toSet -- live -- retired
        val roll = rnd.nextInt(5)
        if (roll == 0 && unmerged.nonEmpty) {
          val c = pick(rnd, unmerged)
          LexIndex.merge(spark, p, tf(Set(c)))
          live += c; trace ++= s" merge($c)"
        } else if (roll == 1 && live.size > 1) {
          val c = pick(rnd, live)
          LexIndex.delete(spark, p, parts(c).select(col("doc_id")))
          live -= c; retired += c; trace ++= s" delete($c)"
        } else if (roll == 2) {
          LexIndex.compact(spark, p); trace ++= " compact"
        } else if (roll == 4) {
          // wholesale replacement from source (the restore primitive):
          // same surviving docs, every bucket republished at a fresh
          // version — content must be invariant
          LexIndex.rebuild(tf(live), p); trace ++= " rebuild"
        } else {
          LexIndex.gc(spark, p); trace ++= " gc"
        }
      }
      val fresh = tempDir(s"lexproto${seed}_fresh")
      LexIndex.build(tf(live), fresh)
      assert(rows(p).sameElements(rows(fresh)),
        s"postings diverged from fresh build after: $trace (live=$live)")
      assert(statsOf(p).sameElements(statsOf(fresh)),
        s"stats diverged from fresh build after: $trace (live=$live)")
      // and after a final sweep the protocol leaves no eligible garbage
      LexIndex.gc(spark, p)
      assert(LexIndex.garbageShare(spark, p) === 0.0,
        s"final gc left eligible garbage after: $trace")
    }
  }
}
