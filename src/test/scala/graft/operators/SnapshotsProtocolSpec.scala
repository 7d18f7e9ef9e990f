package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Randomized protocol check for the sealed-snapshot store: any seeded
  * sequence of create / gc (mixed graces) / redact must leave exactly
  * the model's visible versions, each holding exactly the model's
  * surviving rows, with version numbers allocated strictly monotonically
  * (never re-using a retired-in-grace number). The pairwise contracts
  * are pinned in SnapshotsSpec; this composes them in random orders —
  * the house convention for every mutator family. */
class SnapshotsProtocolSpec extends SparkSpecBase {
  import spark.implicits._

  private val allIds = (1L to 40L).toSeq

  test("random create/gc/redact sequences match the model exactly") {
    for (seed <- Seq(11, 23)) {
      val rnd = new scala.util.Random(seed)
      val root = tempDir(s"snapproto$seed")
      var visible = Map.empty[Long, Set[Long]]
      var maxAlloc = 0L
      val trace = new StringBuilder("start")
      def check(): Unit = {
        assert(Snapshots.versions(spark, root) == visible.keys.toSeq.sorted,
          s"versions diverged after: $trace")
        for ((v, ids) <- visible) {
          val got = Snapshots.open(spark, root, v)
            .select("doc_id").as[Long].collect().toSet
          assert(got == ids, s"v=$v content diverged after: $trace")
        }
      }
      for (_ <- 1 to 10) {
        rnd.nextInt(4) match {
          case 0 | 3 =>
            // id 1 always sealed: no version empties under the %m
            // redactions below (the empty edge has its own test)
            val ids = allIds.filter(_ => rnd.nextBoolean()).toSet + 1L
            val v = Snapshots.create(spark, root,
              ids.toSeq.toDF("doc_id")
                .withColumn("fp", col("doc_id") * 7L))
            assert(v == maxAlloc + 1L,
              s"allocation not monotone (got $v, had $maxAlloc) after: $trace")
            maxAlloc = v; visible += v -> ids
            trace ++= s" create($v,${ids.size})"
          case 1 =>
            val keep = visible.keys.filter(_ => rnd.nextBoolean()).toSet
            val grace = if (rnd.nextBoolean()) 0L else 60L * 60 * 1000
            Snapshots.gc(spark, root, keep.contains _, grace)
            visible = visible.view.filterKeys(keep).toMap
            trace ++= s" gc(keep=${keep.toSeq.sorted.mkString("/")},g=$grace)"
          case 2 =>
            val m = rnd.nextInt(3) + 2
            val victims = allIds.filter(_ % m == 0)
            Snapshots.redact(spark, root, victims.toDF("doc_id"))
            visible = visible.map { case (v, ids) => v -> (ids -- victims) }
            trace ++= s" redact(%$m)"
        }
        check()
      }
    }
  }

  test("a takedown that empties a sealed version leaves it open-able with zero rows") {
    val root = tempDir("snapempty")
    val v = Snapshots.create(spark, root,
      Seq(2L, 4L).toDF("doc_id").withColumn("fp", col("doc_id")))
    Snapshots.redact(spark, root, Seq(2L, 4L).toDF("doc_id"))
    assert(Snapshots.versions(spark, root) == Seq(v))
    assert(Snapshots.open(spark, root, v).count() == 0L,
      "emptied sealed version is not readable")
  }
}
