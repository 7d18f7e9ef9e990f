package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** The training-shard packing composition — what turns a sealed
  * snapshot's KEPT set into the shard manifest a trainer mounts:
  * token-balanced shard assignment (the q107 serpentine deal: rank by
  * token count within (lang, grp) hash sub-groups, deal 0,1,…,S−1,
  * S−1,…,1,0 so each pass pairs a heavy doc with a lighter one) and
  * chunked context-window packing within each (lang, shard) (the q104
  * running-sum bin fill over fixed token chunks, so a long document
  * SPLITS across bins instead of overflowing one).
  *
  * The output is a chunk MANIFEST — (doc_id, lang, split, shard, bin,
  * start, chunk_len, fp) — not token text: sealed artifacts retain no
  * corpus content (the snapshot discipline), a trainer hydrates by
  * (doc_id, start, chunk_len) against the text store and `fp` lets it
  * verify the text is still the sealed bytes first. Deterministic
  * given (kept set, corpus text, params): re-exporting after a
  * takedown reproduces exactly the surviving docs' packing.
  *
  * Scale shape: one tokenize pass; the rank and pack windows are keyed
  * by (lang, grp) / (lang, shard) — group count scales ∝ corpus /
  * target partition size in production, so no window ever sees the
  * corpus (the q88/q107 rule). */
object ShardExport {

  val DefaultCtx = 256
  val DefaultChunk = 32
  val DefaultShards = 4
  val DefaultGroups = 4

  /** Pack `keptDocs` (doc_id, lang, split, fp, text) into the shard
    * manifest. Zero-token docs carry no trainable content and are
    * dropped BEFORE the serpentine rank (they would only shift deal
    * positions). */
  def pack(keptDocs: DataFrame, ctx: Int = DefaultCtx,
           chunk: Int = DefaultChunk, shards: Int = DefaultShards,
           groups: Int = DefaultGroups): DataFrame = {
    import graft.functions.TextFunctions.{strHash, tokens}
    val base = keptDocs
      .withColumn("n", size(tokens(col("text"))))
      .filter(col("n") > 0)
      .withColumn("grp",
        strHash(concat(lit("shard:"), col("doc_id").cast(StringType))) % groups)
    val wRank = Window.partitionBy(col("lang"), col("grp"))
      .orderBy(col("n").desc, col("doc_id").asc)
    val assigned = base
      .withColumn("rk", row_number().over(wRank))
      .withColumn("pos", (col("rk") - 1) % shards)
      .withColumn("shard",
        when((floor((col("rk") - 1) / shards) % 2) === 0, col("pos"))
          .otherwise(lit(shards - 1) - col("pos")).cast(IntegerType))
      .select(col("doc_id"), col("lang"), col("split"), col("fp"),
        col("n"), col("shard"))
    val wPack = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc, col("start").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assigned
      .select(col("doc_id"), col("lang"), col("split"), col("fp"),
        col("shard"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(chunk))).as("start"))
      .withColumn("start", col("start").cast(LongType))
      .withColumn("chunk_len",
        least(lit(chunk), col("n") - col("start")).cast(LongType))
      .withColumn("h",
        strHash(concat(lit("order:"), col("doc_id").cast(StringType))))
      .withColumn("cum", sum(col("chunk_len")).over(wPack))
      // FLOOR, not a cast: DuckDB's double→int cast rounds, Spark's
      // truncates — FLOOR is the portable spelling (the q88 rule)
      .withColumn("bin",
        floor((col("cum") - col("chunk_len")) / lit(ctx.toDouble)))
      .select(col("doc_id"), col("lang"), col("split"), col("shard"),
        col("bin"), col("start"), col("chunk_len"), col("fp"))
  }
}
