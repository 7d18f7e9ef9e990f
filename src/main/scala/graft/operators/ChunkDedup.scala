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

  // ------------------------------------------------------ CDC variants

  /** Content-defined counterpart of [[chunked]]: chunk boundaries come
    * from the O(L) rolling-hash kernel [[graft.expressions.CdcBounds]]
    * (poly-hash of the trailing `w` code points ≡ 0 mod `d`, forced
    * boundary at end-of-document) instead of a fixed token grid — an
    * edit early in a document resyncs at the next boundary, so repeated
    * boilerplate keeps its fingerprints under local edits (q110; the
    * robustness property fixed-offset chunking lacks). Emits the same
    * column shape as [[chunked]] (`g` = chunk ordinal, plus the char
    * `start`), so the rewrite/index/streaming plumbing is shared.
    *
    * `minLen` enforces a MINIMUM chunk length (the LBFS/FastCDC min-size
    * rule): without it the boundary process emits pathological
    * micro-chunks (two adjacent hash hits ⇒ a 1-char chunk) whose
    * fingerprints collide with unrelated corpus content — a rewrite
    * would cut single spaces out of novel documents. The rule here is
    * set-wise, not LBFS's greedy last-KEPT rule: a candidate boundary
    * closer than `minLen` to its predecessor CANDIDATE (or to 0) is
    * suppressed. Chosen because it is a one-pass array filter expressible
    * identically in Column algebra and oracle SQL (greedy suppression is
    * inherently sequential), it still guarantees every chunk ≥ `minLen`
    * (a kept boundary's predecessor candidate lower-bounds the previous
    * kept boundary, so kept-to-kept gaps ≥ `minLen`), and a keep decision
    * depends only on content within the trailing window — the resync
    * property survives edits exactly as plain CDC does. The forced
    * end-of-document boundary is exempt (the final chunk may be short).
    * `minLen = 1` degenerates to the plain kernel contract q108 pins.
    *
    * Same map-side discipline: one kernel walk + HOF algebra per row,
    * `first_in_doc` an in-array prefix scan (no window, streaming-safe),
    * every lambda referencing only materialized attributes. */
  def cdcChunked(docs: DataFrame, textCol: String,
                 w: Int = 8, d: Long = 16L, minLen: Int = 4): DataFrame = {
    import graft.functions.TextFunctions.cdcBounds
    val txt = col(textCol)
    docs
      .filter(length(txt) > 0)
      .withColumn("__cand", cdcBounds(txt, w, d))
      .withColumn("__keptb",
        filter(col("__cand"), (b, i) =>
          b - when(i === 0, lit(0L))
            .otherwise(element_at(col("__cand"), i)) >= minLen))
      .withColumn("__ends", array_sort(array_distinct(
        concat(col("__keptb"), array(length(txt))))))
      .withColumn("__starts",
        concat(array(lit(0)), slice(col("__ends"), lit(1), size(col("__ends")) - 1)))
      // hash each chunk ONCE into a long array; the O(m²) first_in_doc
      // prefix scan then compares longs, never strings — flagging by
      // fingerprint is also what the global rule and the streaming index
      // probe key on. (A struct-array-of-chunk-texts variant measured
      // 13× slower here: the flag lambda's per-element prefix slice
      // re-evaluated the substring construction.)
      .withColumn("__hs",
        zip_with(col("__starts"), col("__ends"),
          (s, e) => strHash(txt.substr(s + 1, e - s))))
      .withColumn("__flags",
        transform(col("__hs"), (h, i) =>
          !exists(slice(col("__hs"), lit(1), i), p => p === h)))
      .select(col("*"),
        posexplode(arrays_zip(col("__starts"), col("__ends"), col("__hs"),
          col("__flags"))).as(Seq("g", "__e")))
      .withColumn("start", col("__e.__starts"))
      .withColumn("chunk_text",
        txt.substr(col("__e.__starts") + 1,
          col("__e.__ends") - col("__e.__starts")))
      .withColumn("chunk_hash", col("__e.__hs"))
      .withColumn("first_in_doc", col("__e.__flags"))
      .drop("__cand", "__keptb", "__ends", "__starts", "__hs", "__flags", "__e")
  }

  /** [[rewrite]] over content-defined chunks: globally-first fingerprint
    * occurrences survive (the same partial-aggregatable packed-min — no
    * chunk_hash window), documents re-assemble by concatenating
    * surviving chunks WITHOUT a separator (CDC chunks partition the
    * character stream, not a token list). q110 runs this under the
    * DuckDB oracle gate.
    *
    * @return (idCol, n_chunks, n_kept, cleaned) */
  def cdcRewrite(docs: DataFrame, idCol: String, textCol: String,
                 w: Int = 8, d: Long = 16L, minLen: Int = 4): DataFrame = {
    val chunks =
      cdcChunked(docs.select(col(idCol), col(textCol)), textCol, w, d, minLen)
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
        array_join(transform(
          filter(col("cs"), x => x.getField("kept")),
          x => x.getField("chunk_text")), ""))
      .select(col(idCol), col("n_chunks"), col("n_kept"), col("cleaned"))
  }

  /** Corpus fingerprint set for the CDC chunking — the persisted index
    * [[graft.streaming.StreamOps.streamingCdcRewrite]] probes. */
  def cdcChunkIndex(corpus: DataFrame, textCol: String,
                    w: Int = 8, d: Long = 16L, minLen: Int = 4): DataFrame =
    cdcChunked(corpus.select(col(textCol)), textCol, w, d, minLen)
      .select(col("chunk_hash")).distinct()
}
