package graft.queries

import org.apache.spark.sql.functions._

/** Scratch probe for the near-dup generators' scale shape: times the
  * hinted (broadcast) vs unhinted (Catalyst-planned) q32 pipeline at
  * two SFs, so broadcast-growth hypotheses are measured instead of
  * guessed. Test-scope tool, not part of the library surface.
  *
  *   sbt "Test/runMain graft.queries.NearDupProbe"
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = Seq("/root/testdata/sf0.1", "target/sf_big")
    for (d <- dirs; hinted <- Seq(true, false); rep <- 1 to 2) {
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val (pairs, cleanup) = SimilarityQ.lshNearDupPairsScoped(docs, hinted = hinted)
      val n = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      println(f"q32 dir=$d%-22s hinted=$hinted%-5s rep=$rep  $dt%6.2f s  ($n pairs)")
    }
    for (d <- dirs; bc <- Seq(true, false); rep <- 1 to 2) {
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
      val cfg = graft.pipelines.Curation.Config(
        minQuality = 2.95, broadcastPairDims = bc)
      val t0 = System.nanoTime()
      val n = graft.pipelines.Curation.curate(docs, bench, cfg).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"q79 dir=$d%-22s bcast=$bc%-5s rep=$rep  $dt%6.2f s  ($n rows)")
    }
    spark.stop()
  }
}
