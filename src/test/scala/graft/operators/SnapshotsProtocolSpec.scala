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

  test("random create/gc/redact/export/reexport sequences match the model exactly") {
    val docs = allIds.map(i => (i, if (i % 2 == 0) "en" else "de",
        s"alpha$i beta gamma$i"))
      .toDF("doc_id", "lang", "text")
    for (seed <- Seq(11, 23)) {
      val rnd = new scala.util.Random(seed)
      val root = tempDir(s"snapproto$seed")
      var visible = Map.empty[Long, Set[Long]]
      // per exported version: (ids at export time, still fresh?)
      var exports = Map.empty[Long, (Set[Long], Boolean)]
      var maxAlloc = 0L
      val trace = new StringBuilder("start")
      def check(): Unit = {
        assert(Snapshots.versions(spark, root) == visible.keys.toSeq.sorted,
          s"versions diverged after: $trace")
        for ((v, ids) <- visible) {
          val got = Snapshots.open(spark, root, v)
            .select("doc_id").as[Long].collect().toSet
          assert(got == ids, s"v=$v content diverged after: $trace")
          exports.get(v) match {
            case None =>
              intercept[IllegalArgumentException](
                Snapshots.openShards(spark, root, v))
            case Some((eIds, true)) =>
              val sIds = Snapshots.openShards(spark, root, v)
                .select("doc_id").distinct().as[Long].collect().toSet
              assert(sIds == eIds, s"v=$v shard ids diverged after: $trace")
            case Some((_, false)) =>
              intercept[IllegalStateException](
                Snapshots.openShards(spark, root, v))
          }
        }
      }
      for (_ <- 1 to 12) {
        rnd.nextInt(6) match {
          case 0 | 3 =>
            // id 1 always sealed: no version empties under the %m
            // redactions below (the empty edge has its own test)
            val ids = allIds.filter(_ => rnd.nextBoolean()).toSet + 1L
            val rows = ids.toSeq.toDF("doc_id")
              .withColumn("fp", col("doc_id") * 7L)
              .withColumn("keep", lit(true))
              .withColumn("split", lit("train"))
            // full and INCREMENTAL (manifest) seals interleave freely in
            // one history — cross-version references must survive every
            // later redact/gc ordering
            val v =
              if (rnd.nextBoolean())
                Snapshots.createIncremental(spark, root,
                  rows.withColumn("batch", col("doc_id") % 4L))
              else Snapshots.create(spark, root, rows)
            assert(v == maxAlloc + 1L,
              s"allocation not monotone (got $v, had $maxAlloc) after: $trace")
            maxAlloc = v; visible += v -> ids
            trace ++= s" create($v,${ids.size})"
          case 1 =>
            val keep = visible.keys.filter(_ => rnd.nextBoolean()).toSet
            val grace = if (rnd.nextBoolean()) 0L else 60L * 60 * 1000
            Snapshots.gc(spark, root, keep.contains _, grace)
            visible = visible.view.filterKeys(keep).toMap
            exports = exports.view.filterKeys(keep).toMap
            trace ++= s" gc(keep=${keep.toSeq.sorted.mkString("/")},g=$grace)"
          case 2 =>
            val m = rnd.nextInt(3) + 2
            val victims = allIds.filter(_ % m == 0).toSet
            Snapshots.redact(spark, root, victims.toSeq.toDF("doc_id"))
            // only victim-bearing versions bump their data revision —
            // exports of untouched versions stay fresh
            exports = exports.map { case (v, (eIds, fresh)) =>
              v -> (eIds, fresh && (visible(v) & victims).isEmpty)
            }
            visible = visible.map { case (v, ids) => v -> (ids -- victims) }
            trace ++= s" redact(%$m)"
          case 4 if visible.nonEmpty =>
            val v = visible.keys.toSeq.sorted
              .apply(rnd.nextInt(visible.size))
            Snapshots.exportShards(spark, root, v, docs, ctx = 8, chunk = 2)
            exports += v -> (visible(v), true)
            trace ++= s" export($v)"
          case 5 =>
            Snapshots.reexportStaleShards(spark, root, docs)
            exports = exports.map { case (v, (_, _)) =>
              v -> (visible(v), true)
            }
            trace ++= s" reexport"
          case _ => ()
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
