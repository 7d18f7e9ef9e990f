package graft.pipelines

import graft.SparkSpecBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** The decontamination stage's broadcast ceiling contract: a benchmark
  * shingle set that outgrows `Config.maxBroadcastShingles` swaps from
  * the one-sorted-array broadcast kernel to a shingle-keyed join — and
  * the swap must be invisible in the results. Also proves the fleet
  * shape of the join side: a benchmark table bucketed on `h` joins
  * without shuffling its own side.
  */
class DecontamFallbackSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")

  private def withSh = docs
    .select(col("doc_id"), tokens(col("text")).as("tk"))
    .select(col("doc_id"), wordShingles3(col("tk")).as("sh"))

  test("curate is row-identical across the broadcast->join decontam swap") {
    val cfgB = Curation.Config(minQuality = 2.95) // broadcast path (default switch)
    val cfgJ = cfgB.copy(maxBroadcastShingles = 0L) // force the join path
    def run(cfg: Curation.Config): Array[String] =
      Curation.curate(docs, bench, cfg).drop("text")
        .collect().map(_.toString).sorted
    val viaBroadcast = run(cfgB)
    val viaJoin = run(cfgJ)
    assert(viaBroadcast.nonEmpty)
    assert(viaJoin.sameElements(viaBroadcast),
      "decision table changed under the join-path decontamination")
  }

  test("overlapJoin equals the sorted-intersect kernel per document") {
    val benchSh = Curation.benchShingles(bench)
    def grab(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      df.select(col("doc_id"), col("n_overlap")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaKernel = grab(Curation.overlapBroadcast(withSh, benchSh))
    val viaJoin = grab(Curation.overlapJoin(withSh, benchSh))
    assert(viaKernel.exists(_._2 > 0), "contract is vacuous: zero overlap everywhere")
    assert(viaKernel.exists(_._2 == 0), "contract is weak: every doc overlaps")
    assert(viaJoin.sameElements(viaKernel),
      "join-path overlap diverged from the intersect kernel")
  }

  test("a benchmark shingle table bucketed on h joins without shuffling its side") {
    val tbl = s"bench_sh_$runTag"
    graft.operators.Bucketing.persistBucketed(
      Curation.benchShingles(bench), tbl, "h", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Curation.overlapJoin(withSh, spark.table(tbl))
      val got = out.select(col("doc_id"), col("n_overlap")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = Curation.overlapBroadcast(withSh, Curation.benchShingles(bench))
        .select(col("doc_id"), col("n_overlap")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.sameElements(want), "bucketed-side join changed the overlap counts")
      val p = out.queryExecution.executedPlan.toString
      // "Bucketed: true" is Spark's statement that the scan produced the
      // bucket partitioning — i.e. the benchmark side fed the join
      // WITHOUT an exchange of its own
      assert(p.contains("Bucketed: true"),
        s"benchmark scan did not use the bucket layout:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
