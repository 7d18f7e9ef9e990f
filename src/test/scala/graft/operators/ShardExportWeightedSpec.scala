package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The mixture-weighted packing path ([[ShardExport.packWeighted]])
  * and the two sealed-store readouts ([[Snapshots.shardReport]],
  * [[Snapshots.card]]). */
class ShardExportWeightedSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDf: DataFrame = (1L to 20L)
    .map(i => (i, if (i % 2 == 0) "en" else "de",
      Seq.fill((i % 5).toInt + 1)(s"w$i tok").mkString(" ")))
    .toDF("doc_id", "lang", "text")

  private def withCopies(docs: DataFrame,
                         plan: org.apache.spark.sql.Column): DataFrame =
    docs.select(col("doc_id"), col("lang"), lit("train").as("split"),
      Snapshots.fingerprint(col("text")).as("fp"), col("text"))
      .withColumn("n_copies", plan)

  test("packWeighted: every copy packs once, zero-copy and zero-token docs drop") {
    val docs = docsDf
    val units = withCopies(docs, col("doc_id") % 3) // 0,1,2 copies round-robin
    val m = ShardExport.packWeighted(units, ctx = 8, chunk = 2)
    // exactly (doc_id, copy) pairs for n_copies>0, copy in [0, n)
    val got = m.select(col("doc_id"), col("copy")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (1L to 20L).flatMap(i => (0L until (i % 3)).map(i -> _)).toSet
    assert(got == want, s"pack units diverged: got ${got.size}, want ${want.size}")
    // per (doc, copy): chunk_lens sum to the doc's token count
    val tokOf = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
    val sums = m.groupBy(col("doc_id"), col("copy"))
      .agg(sum(col("chunk_len")).as("s"))
      .join(tokOf, Seq("doc_id"))
    assert(sums.filter(col("s") =!= col("n")).isEmpty,
      "a copy's chunks do not cover its document")
    // deterministic: a second invocation is bitwise identical
    val again = ShardExport.packWeighted(units, ctx = 8, chunk = 2)
      .collect().map(_.toString).sorted
    assert(again.sameElements(m.collect().map(_.toString).sorted))
  }

  test("packWeighted: copies of one doc get independent deal positions") {
    val docs = docsDf
    val m = ShardExport.packWeighted(withCopies(docs, lit(8L)),
      ctx = 8, chunk = 2, shards = 4)
    // with 8 copies each over 4 shards, at least one doc's copies span
    // more than one shard (the hash-keyed deal would only degenerate if
    // the unit key ignored `copy`)
    val spread = m.groupBy(col("doc_id"))
      .agg(countDistinct(col("shard")).as("k"))
      .agg(max(col("k"))).head.getLong(0)
    assert(spread > 1L, "copies clump into one shard — unit key ignores copy")
  }

  test("shardReport aggregates the manifest and reads ctx from the marker") {
    val root = tempDir("shardrep")
    val docs = docsDf
    val sealedDf = docs.select(col("doc_id"), lit(true).as("keep"),
      lit("train").as("split"), col("doc_id").as("component"),
      lit(true).as("dedup_keep"))
      .join(Snapshots.fingerprints(docs), Seq("doc_id"))
    val v = Snapshots.create(spark, root, sealedDf)
    Snapshots.exportShards(spark, root, v, docs, ctx = 8, chunk = 2)
    val rep = Snapshots.shardReport(spark, root, v)
    val m = Snapshots.openShards(spark, root, v)
    val wantChunks = m.count()
    assert(rep.agg(sum(col("n_chunks"))).head.getLong(0) == wantChunks)
    val wantTokens = m.agg(sum(col("chunk_len"))).head.getLong(0)
    assert(rep.agg(sum(col("n_tokens"))).head.getLong(0) == wantTokens)
    // fill share uses the SEALED ctx (8), not the default (256): with
    // ctx=8 and these short docs the fill is near 1, with 256 it would
    // be far below 0.2
    val minFill = rep.agg(min(col("fill_share"))).head.getDouble(0)
    assert(minFill > 0.2, s"fill_share=$minFill — marker ctx not honored")
    // report refuses a stale export like openShards does
    Snapshots.redact(spark, root, Seq(4L).toDF("doc_id"))
    intercept[IllegalStateException](Snapshots.shardReport(spark, root, v))
  }

  test("card reads composition from the sealed store alone") {
    val root = tempDir("card")
    val docs = docsDf
    val sealedDf = docs.select(col("doc_id"),
      (col("doc_id") =!= 3L).as("keep"),
      when(col("doc_id") % 4 === 0, "val").otherwise("train").as("split"),
      (col("doc_id") % 5).as("component"), lit(true).as("dedup_keep"))
      .join(Snapshots.fingerprints(docs), Seq("doc_id"))
    val v = Snapshots.create(spark, root, sealedDf)
    val card = Snapshots.card(spark, root, v).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val kept = sealedDf.filter(col("keep"))
    val want = kept.groupBy(col("split"))
      .agg(count(lit(1)), countDistinct(col("component")), sum(col("len")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(card == want, s"card=$card want=$want")
    // shares sum to 1 over the sealed bytes
    val shareSum = Snapshots.card(spark, root, v)
      .agg(sum(col("len_share"))).head.getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }
}
