package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.TextFunctions.{strHash, tokens}

/** Substring-grain dedup with document REWRITE (the Lee et al. 2021
  * "Deduplicating Training Data Makes Language Models Better" shape, at
  * chunk granularity): documents are cut into NON-overlapping c-token
  * chunks (the tail keeps its short remainder — non-overlapping chunks
  * PARTITION the document, so dropping one is a well-defined edit),
  * every chunk that repeats anywhere in the corpus keeps only its
  * globally FIRST occurrence (lowest (doc_id, position)), and each
  * document re-assembles from its surviving chunks in position order.
  * The output is the cleaned corpus a tokenizer actually consumes, not
  * just a report. q91 is the detection-side complement (overlapping
  * chunks, boilerplate ratios); q94 runs [[rewrite]] under the DuckDB
  * oracle gate; [[graft.streaming.StreamOps.streamingChunkRewrite]] is
  * the ingest-time analog probing a persisted [[chunkIndex]].
  *
  * Scale shape: chunking is a map-side explode, linear in corpus
  * tokens. First-occurrence is deliberately NOT a window over
  * chunk_hash — a license header appearing in 10⁹ documents would make
  * that one window partition hold 10⁹ rows (unbounded skew). Instead it
  * is min(packed position) per chunk_hash: a partial-aggregatable
  * reduce (map-side combine collapses each partition's occurrences to
  * one row before the shuffle — PlanContractSpec asserts the two
  * HashAggregate levels) followed by a keyed join back at the same
  * grain. Re-assembly is one doc-grain aggregation.
  */
object ChunkDedup {

  /** g < 2²⁰ packs (doc_id, g) into one BIGINT key for the
    * first-occurrence min — exact while docs stay under ~10⁶ chunks
    * (a 20M-token document; far past any real document). */
  val PosPack: Long = 1L << 20

  /** Map-side chunk explosion: every input column passes through, plus
    * (g, chunk_text, first_in_doc, chunk_hash) per chunk. `first_in_doc`
    * is computed INSIDE the per-doc chunk array (an O(m²) prefix scan
    * over a doc's own m chunks — m is tiny), not with a window: the
    * streaming consumer has no window available and the batch consumer
    * must not pay a shuffle for a per-row fact. The HOF-lambda contract
    * applies: the chunk array is materialized as an attribute before
    * the flagging lambda references it per element. */
  def chunked(docs: DataFrame, textCol: String, c: Int): DataFrame = {
    val cs = docs
      .withColumn("__tk", tokens(col(textCol)))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .withColumn("__cs",
        transform(sequence(lit(0), col("__n") - 1, lit(c)),
          g => struct(g.cast("int").as("g"),
            concat_ws(" ", slice(col("__tk"), g + 1, lit(c))).as("chunk_text"))))
      .withColumn("__csf",
        transform(col("__cs"), (e, i) => struct(
          e.getField("g").as("g"),
          e.getField("chunk_text").as("chunk_text"),
          (!exists(slice(col("__cs"), lit(1), i),
            p => p.getField("chunk_text") === e.getField("chunk_text")))
            .as("first_in_doc"))))
      .drop("__tk", "__n", "__cs")
    cs
      .select(col("*"), explode(col("__csf")).as("__e"))
      .withColumn("g", col("__e.g"))
      .withColumn("chunk_text", col("__e.chunk_text"))
      .withColumn("first_in_doc", col("__e.first_in_doc"))
      .withColumn("chunk_hash", strHash(col("chunk_text")))
      .drop("__csf", "__e")
  }

  /** Full-corpus rewrite: globally-first chunk occurrences survive,
    * documents re-assemble in position order.
    *
    * @return (idCol, n_chunks, n_kept, cleaned) */
  def rewrite(docs: DataFrame, idCol: String, textCol: String,
              c: Int = 20): DataFrame = {
    val chunks = chunked(docs.select(col(idCol), col(textCol)), textCol, c)
      .withColumn("pos_key", col(idCol) * PosPack + col("g"))
      .select(col(idCol), col("g"), col("chunk_text"), col("chunk_hash"),
        col("pos_key"))
    val firsts = chunks.groupBy(col("chunk_hash"))
      .agg(min(col("pos_key")).as("first_key"))
    chunks.join(firsts, Seq("chunk_hash"))
      .withColumn("kept", col("pos_key") === col("first_key"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(struct(col("g"), col("kept"), col("chunk_text"))))
          .as("cs"))
      .withColumn("cleaned",
        concat_ws(" ", transform(
          filter(col("cs"), x => x.getField("kept")),
          x => x.getField("chunk_text"))))
      .select(col(idCol), col("n_chunks"), col("n_kept"), col("cleaned"))
  }

  /** Delta rewrite against a persisted corpus [[chunkIndex]]: a chunk
    * survives iff it is the delta-global FIRST occurrence (the same
    * packed-min as [[rewrite]], over the delta only) AND its hash is not
    * in the index. Because every indexed chunk precedes every delta
    * chunk, this equals [[rewrite]] over corpus ∪ delta restricted to
    * the delta — the day-end batch form of the ingest-time
    * [[graft.streaming.StreamOps.streamingChunkRewrite]] (which, being
    * stateless, handles only within-doc repeats; THIS covers cross-doc
    * repeats within the delta). DailyDriver.chunkStep drives it and
    * appends the survivors to the index.
    *
    * @return (idCol, n_chunks, n_kept, cleaned) */
  def rewriteAgainst(docs: DataFrame, idCol: String, textCol: String,
                     index: DataFrame, c: Int = 20): DataFrame = {
    val chunks = chunked(docs.select(col(idCol), col(textCol)), textCol, c)
      .withColumn("pos_key", col(idCol) * PosPack + col("g"))
      .select(col(idCol), col("g"), col("chunk_text"), col("chunk_hash"),
        col("pos_key"))
    val firsts = chunks.groupBy(col("chunk_hash"))
      .agg(min(col("pos_key")).as("first_key"))
    // distinct: a duplicated index row (an aborted append retried) would
    // otherwise fan out this join and inflate the per-doc chunk counts
    chunks.join(firsts, Seq("chunk_hash"))
      .join(index.select(col("chunk_hash")).distinct()
          .withColumn("__hit", lit(1)),
        Seq("chunk_hash"), "left")
      .withColumn("kept",
        col("pos_key") === col("first_key") && col("__hit").isNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(struct(col("g"), col("kept"), col("chunk_text"))))
          .as("cs"))
      .withColumn("cleaned",
        concat_ws(" ", transform(
          filter(col("cs"), x => x.getField("kept")),
          x => x.getField("chunk_text"))))
      .select(col(idCol), col("n_chunks"), col("n_kept"), col("cleaned"))
  }

  /** The persisted probe side for ingest-time chunk dedup: the corpus's
    * distinct chunk hashes. Any corpus occurrence precedes anything that
    * arrives later, so membership alone decides — no position needed. At
    * fleet scale this persists bucketed on chunk_hash and grows by
    * appending the accepted chunks of each day's delta. */
  def chunkIndex(corpus: DataFrame, textCol: String, c: Int = 20): DataFrame =
    chunked(corpus.select(col(textCol)), textCol, c)
      .select(col("chunk_hash")).distinct()
}
