package graft.pipelines

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The decision table's retention boundary ([[DailyDriver
  * .retireDecisions]]): folding old batch partitions into the base must
  * be IDENTITY on reads, bound the live partition count, stay
  * idempotent, and leave later steps/forgets both correct (equal to a
  * never-retired twin) and delta-grain (recent-only work never touches
  * the folded base). */
class DailyDriverRetireSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val cfg = Curation.Config(minQuality = 2.95)

  private def canon(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  private def batchDirs(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/decisions")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSeq.sorted
  }

  private def baseState(dir: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/decisions/batch=0")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(st =>
      (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq.sorted
  }

  test("fold is identity on reads, bounds partitions, and keeps later work delta-grain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val day0 = docs.filter(col("doc_id") % 5 === 0)
    def day(k: Int) = docs.filter(col("doc_id") % 5 === k)

    // never-retired twin — the gold reference for every later equality
    val dirA = tempDir("retire-ref")
    DailyDriver.init(spark, day0, bench, dirA, cfg)
    (1 to 3).foreach(k => DailyDriver.step(spark, day(k), bench, dirA, cfg))

    val dirB = tempDir("retire-live")
    DailyDriver.init(spark, day0, bench, dirB, cfg)
    (1 to 3).foreach(k => DailyDriver.step(spark, day(k), bench, dirB, cfg))
    val before = canon(DailyDriver.openDecisions(spark, dirB))
    assert(batchDirs(dirB).size == 4, s"fixture: ${batchDirs(dirB)}")

    // fold all but the newest day: 2 partitions retire into the base
    val folded = DailyDriver.retireDecisions(spark, dirB, keepBatches = 1)
    assert(folded == 2L, s"expected 2 folded partitions, got $folded")
    assert(canon(DailyDriver.openDecisions(spark, dirB)).sameElements(before),
      "retention changed the decision rows — fold must be identity on reads")
    val dirs = batchDirs(dirB)
    assert(dirs.size == 2 && dirs.head == "batch=0",
      s"expected base + newest grain, got $dirs")
    // idempotent: nothing older than the horizon remains
    assert(DailyDriver.retireDecisions(spark, dirB, keepBatches = 1) == 0L,
      "a replayed retire folded again")

    // the step AFTER retirement equals the never-retired twin's
    DailyDriver.step(spark, day(4), bench, dirA, cfg)
    DailyDriver.step(spark, day(4), bench, dirB, cfg)
    assert(canon(DailyDriver.openDecisions(spark, dirB)).sameElements(
      canon(DailyDriver.openDecisions(spark, dirA))),
      "post-retire step diverged from the never-retired twin")

    // DELTA-GRAIN after the fold: a forget whose victims are recent
    // singleton components (no survivors to re-decide, no base members)
    // must not touch the folded base partition at all — the partition
    // pruning the fold is required to preserve
    val dec = DailyDriver.openDecisions(spark, dirB)
    val solo = dec.groupBy(col("component")).count()
      .filter(col("count") === 1).select(col("component"))
    val victims = dec.join(solo, Seq("component"))
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id")).limit(2).collect().map(_.getLong(0))
    assert(victims.nonEmpty, "fixture vacuous: no singleton-component " +
      "victims in the newest day")
    import spark.implicits._
    val base0 = baseState(dirB)
    DailyDriver.forget(spark, victims.toSeq.toDF("doc_id"), docs, dirB, cfg)
    DailyDriver.forget(spark, victims.toSeq.toDF("doc_id"), docs, dirA, cfg)
    assert(baseState(dirB) == base0,
      "a recent-only forget rewrote the folded base partition — the " +
        "retention fold broke delta-grain takedowns")
    assert(canon(DailyDriver.openDecisions(spark, dirB)).sameElements(
      canon(DailyDriver.openDecisions(spark, dirA))),
      "post-retire forget diverged from the never-retired twin")
  }
}
