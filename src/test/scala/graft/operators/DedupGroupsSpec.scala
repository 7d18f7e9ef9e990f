package graft.operators

import graft.SparkSpecBase

class DedupGroupsSpec extends SparkSpecBase {
  import spark.implicits._

  test("canonicalize finds component minima across multi-hop chains") {
    // components: {1,2,3} via chain, {5,6}, chain 10-11-12-13 (diameter 3)
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L)).toDF("a", "b")
    val canon = DedupGroups.canonicalize(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("keepDecisions keeps singletons and component minima only") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (6L, 7L)).toDF("a", "b")
    val kept = DedupGroups.keepDecisions(docs, "doc_id", pairs, "a", "b")
      .filter($"keep").select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 6L, 8L))
  }

  test("result is independent of pair orientation and partitioning") {
    val pairs = Seq((3L, 9L), (9L, 4L), (4L, 12L)).toDF("a", "b")
    val flipped = Seq((9L, 3L), (4L, 9L), (12L, 4L)).toDF("a", "b")
      .repartition(7)
    val x = DedupGroups.canonicalize(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    val y = DedupGroups.canonicalize(flipped, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(x == y)
    assert(x.forall(_._2 == 3L)) // component min
  }
}
