package graft.pipelines

import graft.SparkSpecBase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared construction for the sf0.01 end-to-end curation run: the full
  * documents table curated against a benchmark slice (every 50th doc —
  * verbatim corpus members, so they MUST fail contamination), quality
  * bar at the observed lower quartile so both quality verdicts occur. */
object CurationGolden {
  val SfDir = "/root/testdata/sf0.01"
  val GoldenPath = "src/test/resources/golden/curation_sf001"

  def build(spark: SparkSession): DataFrame = {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    Curation.curate(docs, bench, Curation.Config(minQuality = 2.95))
      .drop("text") // golden stays small + diff-readable; text is input, not a decision
  }
}

/** Regenerates the committed golden parquet. Run after an INTENDED
  * semantics change, then review the diff:
  *   sbt "Test/runMain graft.pipelines.MakeCurationGolden"
  */
object MakeCurationGolden {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CurationGolden.build(spark)
      .orderBy(col("doc_id")).coalesce(1)
      .write.mode("overwrite").parquet(CurationGolden.GoldenPath)
    spark.stop()
  }
}

/** The pipeline-level gate the stage specs (CurationSpec) can't give:
  * the one composed DAG a corpus owner runs, compared row-for-row
  * against a committed golden, plus the scale contract that the corpus
  * side never moves through a non-keyed shuffle. */
class CurationGoldenSpec extends SparkSpecBase {

  private def ordered(df: DataFrame): Array[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toString).sorted
  }

  test("sf0.01 end-to-end run matches the committed golden exactly") {
    val got = CurationGolden.build(spark)
    val golden = spark.read.parquet(CurationGolden.GoldenPath)
    assert(got.columns.sorted.sameElements(golden.columns.sorted),
      s"schema drift: ${got.columns.mkString(",")} vs ${golden.columns.mkString(",")}")
    val g = ordered(got)
    val w = ordered(golden)
    assert(g.length == w.length, s"row count ${g.length} vs golden ${w.length}")
    g.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i diverged:\n  got    $a\n  golden $b")
    }
  }

  test("the golden run exercises every decision path") {
    val r = CurationGolden.build(spark).cache()
    try {
      assert(r.filter(!col("quality_pass")).count() > 0, "no quality failures")
      assert(r.filter(!col("contam_pass")).count() > 0, "no contamination failures")
      assert(r.filter(col("keep")).count() > 0, "nothing kept")
      val splits = r.filter(col("keep")).select("split").distinct()
        .collect().map(_.getString(0)).toSet
      assert(splits == Set("train", "val", "test"), s"splits seen: $splits")
    } finally r.unpersist()
  }

  test("corpus side plans only keyed shuffles (hash or range partitioning)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    val df = CurationGolden.build(spark)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val bad = plan.collect {
      case s: ShuffleExchangeLike => s
    }.filterNot { s =>
      s.outputPartitioning match {
        case _: HashPartitioning | _: RangePartitioning => true
        // A single-partition exchange fed by a PARTIAL aggregate moves one
        // reduced row per input partition — the benchmark shingle-set
        // collect, not the corpus. Anything else funnelling to one
        // partition is a scale bug.
        case _ => s.child.isInstanceOf[BaseAggregateExec]
      }
    }
    assert(bad.isEmpty,
      s"non-keyed shuffle moves the corpus: ${bad.map(_.outputPartitioning)}\n$plan")
  }
}
