package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The persisted inverted index's contracts: search reads only the
  * query terms' buckets (partition pruning at file listing) and its
  * results are identical to the inline scorer on the same tf relation. */
class LexIndexSpec extends SparkSpecBase {

  private lazy val path = tempDir("lexindex")
  private lazy val tf = {
    val t = UnigramLm.termFreq(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") % 97 =!= 0),
      "doc_id", "text").cache()
    LexIndex.build(t, path)
    t
  }

  private def someQterms() = {
    import spark.implicits._
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val terms = dfreq.orderBy(col("df").asc, col("term").asc)
      .limit(6).select("term").as[String].collect()
    (terms.take(3).map(t => (0L, t)) ++ terms.drop(3).map(t => (1L, t)))
      .toSeq.toDF("q_id", "term")
  }

  test("search scan is partition-pruned on the term bucket") {
    val res = LexIndex.search(spark, path, someQterms(), k = 5)
    val scan = res.queryExecution.executedPlan.toString
    // the POSTINGS scan must carry a non-trivial tb filter (the 1-row
    // stats scan legitimately has none)
    val postingsLines = scan.linesIterator.filter(_.contains("/postings")).toSeq
    assert(postingsLines.nonEmpty, s"no postings scan in plan:\n$scan")
    assert(postingsLines.forall(l => l.contains("PartitionFilters: [tb")),
      s"postings scan is not partition-pruned on tb:\n${postingsLines.mkString("\n")}")
  }

  test("merge(build(A), tf(B)) equals build(A ∪ B) — postings, df, and stats") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val tfA = UnigramLm.termFreq(a, "doc_id", "text")
    val tfB = UnigramLm.termFreq(b, "doc_id", "text")
    val tfAll = UnigramLm.termFreq(a.unionByName(b), "doc_id", "text")
    val incPath = tempDir("lexmerge_inc")
    val fullPath = tempDir("lexmerge_full")
    LexIndex.build(tfA, incPath)
    LexIndex.merge(spark, incPath, tfB)
    LexIndex.build(tfAll, fullPath)
    def rows(p: String) = spark.read.parquet(s"$p/postings")
      .select("term", "doc_id", "tf", "dl", "df", "tb")
      .collect().map(_.toString).sorted
    val (inc, full) = (rows(incPath), rows(fullPath))
    assert(inc.length === full.length, s"posting counts differ: ${inc.length} vs ${full.length}")
    assert(inc.sameElements(full), "incremental postings diverge from full rebuild")
    val si = LexIndex.stats(spark, incPath).collect().map(_.toString)
    val sf2 = LexIndex.stats(spark, fullPath).collect().map(_.toString)
    assert(si.sameElements(sf2), s"stats diverge: ${si.toSeq} vs ${sf2.toSeq}")
  }

  test("search equals the inline scorer on the same tf relation") {
    val qterms = someQterms()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("bm25_s").desc, col("doc_id").asc)
    val inline = Bm25.scorePairs(tf, qterms.join(dfreq, Seq("term")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
      .select("q_id", "rk", "doc_id", "n_hit", "bm25_s")
      .collect().map(_.toString).sorted
    val indexed = LexIndex.search(spark, path, qterms, k = 5)
      .collect().map(_.toString).sorted
    assert(indexed.nonEmpty, "indexed search returned nothing")
    assert(indexed.sameElements(inline),
      s"index/inline divergence:\nindex=${indexed.take(3).mkString(";")}\n" +
        s"inline=${inline.take(3).mkString(";")}")
  }
}
