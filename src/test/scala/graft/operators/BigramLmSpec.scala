package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The bigram count model's contracts: positional extraction and the
  * exact monoid merge that makes daily LM maintenance incremental. */
class BigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  test("bigrams extracts adjacent pairs positionally; short docs contribute nothing") {
    val out = BigramLm.bigrams(
        Seq((1L, "a b b a"), (2L, "x"), (3L, "")).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id", "pv", "cr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out === Array((1L, "a", "b"), (1L, "b", "a"), (1L, "b", "b")))
  }

  test("merge(train(A), train(B)) equals train(A ∪ B) exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = BigramLm.merge(
        BigramLm.train(BigramLm.bigrams(a, "doc_id", "text")),
        BigramLm.train(BigramLm.bigrams(b, "doc_id", "text")))
      .collect().map(_.toString).sorted
    val full = BigramLm.train(BigramLm.bigrams(docs, "doc_id", "text"))
      .collect().map(_.toString).sorted
    assert(merged.nonEmpty && merged.sameElements(full),
      "incremental bigram model diverges from full retrain")
  }
}
