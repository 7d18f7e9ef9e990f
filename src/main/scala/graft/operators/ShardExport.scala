package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * [[packWeighted]] is the MIXTURE-AWARE variant: each document packs
  * `n_copies` times (the q86/q102 epoch plan — integer epochs plus a
  * deterministic fractional-hash extra copy), so an up-weighted
  * low-resource source occupies its target share of the training
  * stream. Copies are independent pack units with their own deal/order
  * hashes — the repeats of one document scatter across shards and bins
  * instead of clumping back to back.
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
    import graft.functions.TextFunctions.tokens
    val base = keptDocs
      .withColumn("n", size(tokens(col("text"))))
      .filter(col("n") > 0)
    packKeyed(base, col("doc_id").cast(StringType),
      Seq(col("doc_id").asc), Seq.empty, ctx, chunk, shards, groups)
  }

  /** [[pack]] with a per-document replication plan: `keptDocs` carries
    * an extra `n_copies` column (≥ 0; zero-copy docs drop out like
    * zero-token ones) and every (doc_id, copy) pair packs as its own
    * unit — the output gains a `copy` column so a trainer (or the
    * oracle) can tell the repeats apart. The unit key `doc_id#copy`
    * feeds both hashes, so copies of one document land in different
    * deal sub-groups and different bin-order positions. */
  def packWeighted(keptDocs: DataFrame, ctx: Int = DefaultCtx,
                   chunk: Int = DefaultChunk, shards: Int = DefaultShards,
                   groups: Int = DefaultGroups): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val base = keptDocs
      .withColumn("n", size(tokens(col("text"))))
      .filter(col("n") > 0 && col("n_copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), col("n_copies").cast(LongType) - 1L)))
    packKeyed(base,
      concat(col("doc_id").cast(StringType), lit("#"),
        col("copy").cast(StringType)),
      Seq(col("doc_id").asc, col("copy").asc), Seq("copy"),
      ctx, chunk, shards, groups)
  }

  /** The shared packing core over arbitrary pack UNITS: `ukey` is the
    * unit's hash identity (plain doc_id for [[pack]], doc_id#copy for
    * [[packWeighted]] — kept separate so the unweighted manifest is
    * bit-stable across engine versions), `tie` the deterministic
    * tiebreak under equal token counts / equal order hashes, `extra`
    * unit columns carried through to the manifest. `base` must hold
    * (doc_id, lang, split, fp, n > 0, extra…). */
  private def packKeyed(base: DataFrame, ukey: Column, tie: Seq[Column],
                        extra: Seq[String], ctx: Int, chunk: Int,
                        shards: Int, groups: Int): DataFrame = {
    import graft.functions.TextFunctions.strHash
    val ex = extra.map(col)
    val keyed = base
      .withColumn("grp", strHash(concat(lit("shard:"), ukey)) % groups)
      .withColumn("h", strHash(concat(lit("order:"), ukey)))
    val wRank = Window.partitionBy(col("lang"), col("grp"))
      .orderBy(col("n").desc +: tie: _*)
    val assigned = keyed
      .withColumn("rk", row_number().over(wRank))
      .withColumn("pos", (col("rk") - 1) % shards)
      .withColumn("shard",
        when((floor((col("rk") - 1) / shards) % 2) === 0, col("pos"))
          .otherwise(lit(shards - 1) - col("pos")).cast(IntegerType))
      .select(col("doc_id") +: col("lang") +: col("split") +: col("fp") +:
        col("n") +: col("h") +: col("shard") +: ex: _*)
    val wPack = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("h").asc +: tie :+ col("start").asc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assigned
      .withColumn("start", explode(sequence(lit(0), col("n") - 1, lit(chunk))))
      .withColumn("start", col("start").cast(LongType))
      .withColumn("chunk_len",
        least(lit(chunk), col("n") - col("start")).cast(LongType))
      .withColumn("cum", sum(col("chunk_len")).over(wPack))
      // FLOOR, not a cast: DuckDB's double→int cast rounds, Spark's
      // truncates — FLOOR is the portable spelling (the q88 rule)
      .withColumn("bin",
        floor((col("cum") - col("chunk_len")) / lit(ctx.toDouble)))
      .select(col("doc_id") +: ex ++: Seq(col("lang"), col("split"),
        col("shard"), col("bin"), col("start"), col("chunk_len"),
        col("fp")): _*)
  }
}
