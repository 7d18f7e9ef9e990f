package graft.pipelines

import graft.SparkSpecBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** [[DailyDriver.maintain]]'s decision-table and fingerprint-table
  * re-layouts are POLICY-GATED on measured file debt like the
  * signature index's (the sig gate's exact measure and threshold):
  * each step's partition publish writes task-count files into the
  * touched batches and nothing else ever compacts them, so without
  * this gate a years-long driver accrues unbounded small-file debt in
  * both tables. Below the threshold the directory listing is the whole
  * cost; above it the re-lay is a pure re-layout (row identity) that
  * compacts each batch partition to one file, batch partitioning
  * preserved (forget's pruning reads it). */
class DailyDriverDecGateSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val cfg = Curation.Config(minQuality = 2.95)

  test("decision/fps re-layouts fire only past the measured file-debt threshold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val dir = tempDir("daily-decgate")
    DailyDriver.init(spark, a, bench, dir, cfg)
    DailyDriver.step(spark, delta, bench, dir, cfg)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(sub: String): Set[String] = {
      def walk(p: Path): Seq[String] = fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet"))
          Seq(st.getPath.toString)
        else Seq.empty
      }
      walk(new Path(s"$dir/$sub")).toSet
    }
    def decRows(): Array[String] =
      DailyDriver.openDecisions(spark, dir).collect().map(_.toString).sorted
    def fpsRows(): Array[String] =
      DailyDriver.openFingerprints(spark, dir).collect()
        .map(_.toString).sorted
    def statusOf(store: String) = DailyDriver.status(spark, dir)
      .find(_.store == store).get

    // force one re-lay: pure re-layout on BOTH tables (row identity),
    // debt drops to zero, one file per batch partition
    val d0 = decRows(); val p0 = fpsRows()
    val rep1 = DailyDriver.maintain(spark, dir, sigRelayShare = -1.0)
    assert(rep1.decRelaid && rep1.fpsRelaid,
      s"forced re-lay did not fire on both tables: $rep1")
    assert(decRows().sameElements(d0), "re-lay changed the decision rows")
    assert(fpsRows().sameElements(p0), "re-lay changed the fps rows")
    assert(statusOf("decisions").debtShare == 0.0 &&
      statusOf("fps").debtShare == 0.0,
      "one file per batch must read as zero debt")
    for (sub <- Seq("decisions", "fps");
         st <- fs.listStatus(new Path(s"$dir/$sub"))
         if st.isDirectory && st.getPath.getName.startsWith("batch=")) {
      val n = fs.listStatus(st.getPath)
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      assert(n == 1, s"$sub/${st.getPath.getName} not compacted: $n files")
    }

    // below the threshold: LISTING-ONLY — not a single data file moves
    // in either table, and the report's measure matches status's
    val fd = files("decisions"); val fp = files("fps")
    val rep2 = DailyDriver.maintain(spark, dir)
    assert(!rep2.decRelaid && !rep2.fpsRelaid &&
      rep2.decFileDebt == 0.0 && rep2.fpsFileDebt == 0.0,
      s"no-debt maintain fired a re-lay: $rep2")
    assert(files("decisions") == fd, "no-debt maintain rewrote decisions")
    assert(files("fps") == fp, "no-debt maintain rewrote fps")
    assert(math.abs(rep2.decFileDebt - statusOf("decisions").debtShare) < 1e-12
      && math.abs(rep2.fpsFileDebt - statusOf("fps").debtShare) < 1e-12,
      s"report and status disagree on the debt: $rep2")
  }
}
