package graft.pipelines

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The decontamination width knob (Curation.Config.shingleWidth) must
  * plumb the SAME width-n shingle definition the oracle-paired queries
  * use: curate() at width 8 on the q122 corpus/benchmark split must
  * reproduce q122's contamination ratios bitwise, and the width must
  * actually matter (width 3 flags strictly more than width 8 on this
  * corpus — the overclaiming the wide production grain exists to fix).
  */
class ShingleWidthSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("curate(shingleWidth = 8) reproduces q122's contamination ratios bitwise") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
    val cur = Curation.curate(corpus, bench, Curation.Config(shingleWidth = 8))
      .select("doc_id", "contam_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q122 = graft.queries.Registry.byName("q122_decontam_width8")
      .run(spark, sf)
      .select("doc_id", "contam_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cur.keySet === q122.keySet, "document sets differ")
    assert(cur.nonEmpty, "empty decision table")
    val diverging = cur.collect {
      case (id, r) if java.lang.Double.doubleToLongBits(r) !=
        java.lang.Double.doubleToLongBits(q122(id)) => id
    }
    assert(diverging.isEmpty,
      s"contam_ratio diverges from q122 for docs ${diverging.take(5).toSeq}")
  }

  test("curate(shingleWidth = 13) reproduces q131's contamination ratios bitwise") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
    val cur = Curation.curate(corpus, bench, Curation.Config(shingleWidth = 13))
      .select("doc_id", "contam_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q131 = graft.queries.Registry.byName("q131_decontam_width13")
      .run(spark, sf)
      .select("doc_id", "contam_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cur.keySet === q131.keySet, "document sets differ")
    assert(cur.nonEmpty, "empty decision table")
    val diverging = cur.collect {
      case (id, r) if java.lang.Double.doubleToLongBits(r) !=
        java.lang.Double.doubleToLongBits(q131(id)) => id
    }
    assert(diverging.isEmpty,
      s"contam_ratio diverges from q131 for docs ${diverging.take(5).toSeq}")
  }

  test("flag counts descend across the width ladder 3 >= 8 >= 13, strictly 3 > 13") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
    def flagged(width: Int): Long =
      Curation.curate(corpus, bench, Curation.Config(shingleWidth = width))
        .filter(col("contam_ratio") > 0.0).count()
    val (w3, w8, w13) = (flagged(3), flagged(8), flagged(13))
    assert(w3 >= w8 && w8 >= w13,
      s"flag counts not monotone: width3=$w3 width8=$w8 width13=$w13")
    assert(w3 > w13, s"width 3 ($w3) not strictly above width 13 ($w13)")
  }

  test("width 3 flags strictly more documents than width 8 (the overclaiming gap)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
    def flagged(width: Int): Long =
      Curation.curate(corpus, bench, Curation.Config(shingleWidth = width))
        .filter(col("contam_ratio") > 0.0).count()
    val (w3, w8) = (flagged(3), flagged(8))
    assert(w3 > w8,
      s"width 3 flagged $w3 docs vs width 8's $w8 — expected strictly more")
    assert(w8 > 0L, "width 8 flagged nothing — the equivalence test is vacuous")
  }
}
