package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming analogs of the reference's incremental loops
  * (SURVEY.md §2.9).
  *
  * ST2 — tumbling subintegration dumps: the fold loop emits an averaged
  * profile every T seconds (`pulsestack.py:594-607`). Streaming fold is
  * stateless once phase is computed from absolute event time (the running
  * counters of the sequential reader are an artifact, §2.9 ST3), so a
  * watermarked tumbling window aggregation reproduces it exactly.
  *
  * ST1 — staging drain: poll-loop that retrieves only `ready −
  * downloaded` files each tick and routes failures to a retry file
  * (`LTA/lta-retrieve.py:482-559`). The downloaded-set is exactly
  * watermarked streaming dedup state; the retry file is a dead-letter
  * sink in `foreachBatch`.
  *
  * All transforms return streaming DataFrames; callers attach sinks via
  * `writeStream` (tests use the memory sink).
  */
object StreamOps {

  /** ST2: phase-fold a live sample stream into per-(window, phase-bin)
    * partial profiles. Watermark bounds state; late samples beyond it are
    * dropped (the reference never reorders — §2.9). */
  def streamingFold(stream: DataFrame, timeCol: String, valueCol: String,
                    t0EpochSec: Double, periodSec: Double, nbins: Int,
                    dumpSeconds: Int, watermark: String = "10 seconds"): DataFrame = {
    val tSec = col(timeCol).cast(DoubleType)
    val turns = (tSec - t0EpochSec) / periodSec
    val phase = turns - floor(turns)
    stream
      .withColumn("ibin", floor(phase * nbins).cast(IntegerType))
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), s"$dumpSeconds seconds"), col("ibin"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"),
        avg(col(valueCol)).as("profile"))
      .select(col("window.start").as("dump_start"), col("ibin"),
        col("n"), col("total"), col("profile"))
  }

  /** ST2 (count-based variant): every N pulses — a keyed aggregation on
    * pulse_idx/N, usable in batch or streaming-with-complete mode. */
  def pulseCountFold(samples: DataFrame, pulseIdxCol: String,
                     binCol: String, valueCol: String, dumpEvery: Long): DataFrame =
    samples
      .withColumn("dump", (col(pulseIdxCol) / dumpEvery).cast(LongType))
      .groupBy(col("dump"), col(binCol))
      .agg(count(lit(1)).as("n"), avg(col(valueCol)).as("profile"))

  /** ST1: incremental staging drain. Input: stream of status events
    * (url, status, event_time). Output: first terminal transition per
    * url — 'ready' rows are the retrieval work-list (each url exactly
    * once, the `ready − downloaded` set), 'failed' rows the dead-letter
    * channel. Dedup state is bounded by the watermark. */
  def stagingDrain(updates: DataFrame, watermark: String = "30 seconds"): DataFrame =
    updates
      .withWatermark("event_time", watermark)
      .filter(col("status").isin("ready", "failed"))
      .dropDuplicates("url")

  final case class StagingEvent(url: String, status: String,
                                event_time: java.sql.Timestamp)
  final case class UrlState(attempts: Int, done: Boolean)
  final case class DrainAction(url: String, action: String, attempts: Int)

  /** ST1 with CUSTOM per-url state (`flatMapGroupsWithState`): the retry
    * bookkeeping of `LTA/lta-retrieve.py:279-282,549-555` as a keyed
    * state machine. Each url accumulates failure attempts across
    * micro-batches; a failure below `maxRetries` emits a 'retry' action
    * (the reference's retry-file append), reaching `maxRetries` emits
    * 'dead' (dead-letter), and the first 'ready' emits 'retrieve' exactly
    * once — later events for a finished url are ignored.
    *
    * State bounding: terminal urls keep a TOMBSTONE (dropping the state
    * would let the poller's re-reported 'ready' re-emit 'retrieve'), but
    * every url's state carries an event-time timeout of `watermark +
    * tombstoneMs`, so state expires once the poller's re-report horizon
    * has passed — bounded by the in-flight window, not the stream's
    * lifetime. The bound has a price: events later than `watermark` are
    * DROPPED before the state machine (an event-time timeout requires a
    * lateness bound), so size the watermark to the poller's worst
    * re-report delay — the default matches the tombstone horizon. */
  def statefulDrain(events: Dataset[StagingEvent],
                    maxRetries: Int = 3,
                    watermark: String = "1 hour",
                    tombstoneMs: Long = 3600L * 1000L): Dataset[DrainAction] = {
    import events.sparkSession.implicits._
    events.withWatermark("event_time", watermark)
      .groupByKey(_.url)
      .flatMapGroupsWithState[UrlState, DrainAction](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (url, evs, state: GroupState[UrlState]) =>
          if (state.hasTimedOut) {
            state.remove() // re-report horizon passed — tombstone expires
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(UrlState(0, done = false))
            val out = scala.collection.mutable.ArrayBuffer.empty[DrainAction]
            val sorted = evs.toSeq.sortBy(_.event_time.getTime)
            sorted.foreach { e =>
              if (!st.done) e.status match {
                case "ready" =>
                  st = st.copy(done = true)
                  out += DrainAction(url, "retrieve", st.attempts)
                case "failed" =>
                  st = st.copy(attempts = st.attempts + 1)
                  if (st.attempts >= maxRetries) {
                    st = st.copy(done = true)
                    out += DrainAction(url, "dead", st.attempts)
                  } else out += DrainAction(url, "retry", st.attempts)
                case _ => () // staging progress ticks carry no action
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              sorted.map(_.event_time.getTime).max + tombstoneMs)
            out.iterator
          }
      }
  }

  /** Streaming document ingestion for the curation pipeline: fingerprint
    * each arriving document with the engine-portable poly-hash (the same
    * exact-dedup key as q30), drop re-crawls of identical content, and
    * tag the token count inline — the streaming front of the batch
    * curation battery (q69-q74). State is bounded:
    * `dropDuplicatesWithinWatermark` evicts a fingerprint once the
    * watermark passes it, so the dedup set tracks the re-crawl horizon,
    * not the stream's lifetime (a plain `dropDuplicates` would grow
    * forever). Per-row work is the same codegen'd Column algebra as the
    * batch path — no extra shuffle beyond the dedup's keyed exchange. */
  def streamingDocIngest(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", graft.functions.TextFunctions.strHash(col("text")))
      .withColumn("n_tokens",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast(LongType))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming front of the reference-LM quality gate
    * ([[graft.operators.UnigramLm]], q96): score arriving documents
    * against a TRAINED static model with zero streaming state — the LM
    * collapses to one broadcast row (term→count map + totals) and the
    * per-document sums run as a map-side `aggregate` fold over the
    * token array, so no (doc, term) shuffle ever forms in the stream.
    *
    * Stream ≡ batch is EXACT, not approximate: both forms accumulate
    * the same integers (Σ tf·(c_t+1) grouped by term ≡ Σ over token
    * positions of (c_t+1) — integer addition commutes) and divide once,
    * so mean_p/oov_frac are bitwise equal to `UnigramLm.score` on the
    * same rows (StreamLmScoreSpec). Tokenless documents are dropped,
    * matching the batch grain (no tf rows → no verdict row).
    *
    * Stateless by construction: append mode, no watermark needed —
    * callers compose [[streamingCurate]]'s watermarked dedup downstream
    * when re-crawl suppression is wanted. */
  def streamingLmScore(docs: DataFrame, lm: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    val lmRow = lm.agg(
      map_from_entries(array_sort(collect_list(
        struct(col("term"), col("c_t"))))).as("lm_map"),
      sum(col("c_t")).as("c_total"),
      count(lit(1)).as("v_size"))
    docs
      .withColumn("tk", TextFunctions.tokens(col("text")))
      .filter(size(col("tk")) > 0)
      .crossJoin(broadcast(lmRow)) // stream-static, one row
      .withColumn("n_tokens", size(col("tk")).cast(LongType))
      .withColumn("l_num",
        aggregate(col("tk"), lit(0L),
          (acc, t) => acc + coalesce(element_at(col("lm_map"), t), lit(0L)) + lit(1L)))
      .withColumn("n_oov",
        size(filter(col("tk"), t => element_at(col("lm_map"), t).isNull))
          .cast(LongType))
      .withColumn("mean_p", col("l_num").cast(DoubleType) /
        (col("n_tokens") * (col("c_total") + col("v_size"))).cast(DoubleType))
      .withColumn("oov_frac",
        col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("keep", col("n_oov") * lit(2L) <= col("n_tokens"))
      .drop("tk", "lm_map", "c_total", "v_size", "l_num")
  }

  /** Streaming front of the curation QUALITY gate: the same
    * counters/score the batch battery verifies (q28, q79 — one
    * definition of "quality" everywhere) applied per micro-batch,
    * sub-threshold rows dropped before the fingerprint dedup, so junk
    * never occupies dedup state. Everything stays codegen'd Column
    * algebra per row; the only stateful op is the watermark-bounded
    * dedup, exactly as [[streamingDocIngest]]. */
  def streamingCurate(docs: DataFrame, minQuality: Double,
                      watermark: String = "1 hour"): DataFrame = {
    import graft.functions.TextFunctions
    val (nTokens, sumLen, nStop, nPunct) =
      TextFunctions.qualityCounters(col("tk"), col("text"))
    docs
      .withColumn("tk", TextFunctions.tokens(col("text")))
      .withColumn("quality",
        TextFunctions.qualityScore(nTokens, sumLen, nStop, nPunct))
      .drop("tk")
      .filter(col("quality") >= minQuality)
      .withColumn("fingerprint", TextFunctions.strHash(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
  }

  /** Dedup-on-ingest against a persisted corpus: the streaming analog of
    * the q32 LSH pipeline. Arriving documents build the SAME MinHash
    * band signature (map-side fold, shared definition in SimilarityQ),
    * stream-static join the signature index on (band, bucket), and
    * verify candidates with the exact sorted-intersect Jaccard — all
    * STATELESS (no watermark state, append mode), because the
    * first-matching-band trick dedups candidate pairs structurally
    * instead of with a stateful distinct.
    *
    * @param docs  streaming (doc_id, text, …)
    * @param index static signature relation from [[signatureIndex]] —
    *              at fleet scale a bucketed table on (band, bucket)
    * @return append-safe (doc_id, dup_of, n_inter, n_union, jaccard) —
    *         one row per (new doc, matched corpus doc) at or above the
    *         threshold; downstream routes matches to a reject/link sink */
  def streamingNearDup(docs: DataFrame, index: DataFrame,
                       threshold: Double = 0.5): DataFrame = {
    import graft.queries.SimilarityQ
    streamingNearDupFromSets(SimilarityQ.hashedTokenSets(docs), index,
      threshold)
  }

  /** [[streamingNearDup]] over PRECOMPUTED token sets (doc_id, toks, n)
    * — the incremental curation delta already tokenized its arrivals in
    * the scoring stage (round 14, VERDICT #3). */
  private[graft] def streamingNearDupFromSets(sets: DataFrame,
                                              index: DataFrame,
                                              threshold: Double = 0.5): DataFrame = {
    import graft.queries.SimilarityQ
    val sig = sets
      .select(col("doc_id"), col("toks"), col("n"))
      .withColumn("buckets", SimilarityQ.bucketVector)
      .select(col("doc_id"), col("toks"), col("n"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band_s", "bucket_s")))
    // signatures ONLY in the exploded band relation — the token arrays
    // would otherwise ride every one of the numBands copies per corpus
    // doc (the same array-shuffle hazard the batch pipeline avoids by
    // splitting sigv from docs); candidates join the token sets back
    // from the un-exploded index below, after the band match prunes
    val idx = index.select(col("doc_id").as("dup_of"),
      col("n").as("ni"), col("buckets").as("buckets_i"),
      posexplode(col("buckets")).as(Seq("band_i", "bucket_i")))
    val earlier = SimilarityQ.earlierBandMatch(
      col("buckets"), col("band_s"), col("buckets_i"))
    // size-ratio prune derived from the threshold (jaccard ≤ min/max, so
    // min/max < t can never reach t) — a hardcoded 0.5 bound would
    // silently drop true matches for any lower threshold. Division, not
    // `min >= t·max`: the quotient rounds exactly like the jaccard
    // comparison below, so the prune never disagrees at the boundary.
    val sizePrune = least(col("n"), col("ni")).cast(DoubleType) /
      greatest(col("n"), col("ni")).cast(DoubleType) >= lit(threshold)
    sig.join(idx,
        col("band_s") === col("band_i") && col("bucket_s") === col("bucket_i") &&
          col("doc_id") =!= col("dup_of") && sizePrune && !earlier)
      .select(col("doc_id"), col("toks"), col("n"), col("dup_of"), col("ni"))
      .join(index.select(col("doc_id").as("dup_of"), col("toks").as("toks_i")),
        Seq("dup_of"))
      .withColumn("n_inter",
        call_function("sorted_intersect_count", col("toks"), col("toks_i")).cast(LongType))
      .withColumn("n_union", col("n") + col("ni") - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / col("n_union").cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("dup_of"), col("n_inter"), col("n_union"),
        col("jaccard"))
  }

  /** The signature index [[streamingNearDup]] probes: one row per corpus
    * doc with its hashed token set and band→bucket vector. Persist it
    * (optionally bucketed on doc_id) and rebuild incrementally by
    * appending the signatures of accepted new docs. */
  def signatureIndex(corpus: DataFrame): DataFrame = {
    import graft.queries.SimilarityQ
    signatureIndexFromSets(SimilarityQ.hashedTokenSets(corpus))
  }

  /** [[signatureIndex]] over PRECOMPUTED token sets (doc_id, toks, n). */
  private[graft] def signatureIndexFromSets(sets: DataFrame): DataFrame = {
    import graft.queries.SimilarityQ
    sets.select(col("doc_id"), col("toks"), col("n"))
      .withColumn("buckets", SimilarityQ.bucketVector)
  }

  /** Chunk-grain dedup-on-ingest with REWRITE: the streaming analog of
    * q94 ([[graft.operators.ChunkDedup]]). Arriving documents chunk
    * map-side with the SAME non-overlapping definition, stream-static
    * LEFT join the persisted corpus [[graft.operators.ChunkDedup.chunkIndex]]
    * (any corpus occurrence precedes the stream, so membership alone
    * decides), and each document re-assembles from its surviving chunks
    * in position order. Within-doc repeats drop via the map-side
    * `first_in_doc` flag (computed inside the doc's own chunk array —
    * no window, no state). CROSS-stream repeats within one delta are,
    * by the same contract as [[streamingNearDup]], the daily batch
    * run's job — ingest-time state for them would grow with the stream.
    *
    * The per-doc re-assembly is a streaming aggregation grouped on
    * (doc_id, event_time) with the watermark column IN the grouping
    * keys, which keeps it append-mode-finalizable and its state
    * watermark-evicted: a group finalizes (and frees) once the
    * watermark passes its event time.
    *
    * `index` must be duplicate-free (ChunkDedup.chunkIndex and
    * DailyDriver.chunkStep keep it so by construction) — a duplicated
    * hash row would fan out the probe join; the batch
    * ChunkDedup.rewriteAgainst distincts defensively, but a per-batch
    * distinct on the static side of a stream would re-shuffle the index
    * every micro-batch.
    *
    * @return append-safe (doc_id, event_time, n_chunks, n_kept, cleaned) */
  def streamingChunkRewrite(docs: DataFrame, index: DataFrame,
                            c: Int = 20,
                            watermark: String = "1 hour"): DataFrame = {
    val ch = graft.operators.ChunkDedup
      .chunked(docs.withWatermark("event_time", watermark), "text", c)
    ch.join(index.select(col("chunk_hash"), lit(1).as("__hit")),
        Seq("chunk_hash"), "left")
      .withColumn("kept", col("first_in_doc") && col("__hit").isNull)
      .groupBy(col("doc_id"), col("event_time"))
      .agg(count(lit(1)).cast(LongType).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(struct(col("g"), col("kept"), col("chunk_text"))))
          .as("__cs"))
      .withColumn("cleaned",
        concat_ws(" ", transform(
          filter(col("__cs"), x => x.getField("kept")),
          x => x.getField("chunk_text"))))
      .select(col("doc_id"), col("event_time"), col("n_chunks"), col("n_kept"),
        col("cleaned"))
  }

  /** Ingest-time CDC rewrite — [[streamingChunkRewrite]] over
    * content-defined chunks ([[graft.operators.ChunkDedup.cdcChunked]]):
    * a chunk whose fingerprint is in the persisted corpus index (or
    * repeats within the arriving document) is cut out, and the document
    * re-assembles from the survivors by plain concatenation (CDC chunks
    * partition the character stream). Same stateless contract: the
    * stream-static left join and the in-array first_in_doc flag need no
    * state store; cross-stream repeats are the daily batch run's job
    * (`ChunkDedup.cdcRewrite`). Because the chunks are content-defined,
    * a re-crawl with a small edit still drops every chunk past the
    * boundary resync — the fixed token grid would keep the whole
    * re-keyed tail. */
  def streamingCdcRewrite(docs: DataFrame, index: DataFrame,
                          w: Int = 8, d: Long = 16L, minLen: Int = 4,
                          watermark: String = "1 hour"): DataFrame = {
    val ch = graft.operators.ChunkDedup
      .cdcChunked(docs.withWatermark("event_time", watermark), "text", w, d,
        minLen)
    ch.join(index.select(col("chunk_hash"), lit(1).as("__hit")),
        Seq("chunk_hash"), "left")
      .withColumn("kept", col("first_in_doc") && col("__hit").isNull)
      .groupBy(col("doc_id"), col("event_time"))
      .agg(count(lit(1)).cast(LongType).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(struct(col("g"), col("kept"), col("chunk_text"))))
          .as("__cs"))
      .withColumn("cleaned",
        array_join(transform(
          filter(col("__cs"), x => x.getField("kept")),
          x => x.getField("chunk_text")), ""))
      .select(col("doc_id"), col("event_time"), col("n_chunks"), col("n_kept"),
        col("cleaned"))
  }

  /** Stream-static BM25: score arriving documents against a FIXED
    * retrieval workload (query terms + corpus statistics pinned from
    * the indexed snapshot — [[graft.operators.Bm25.queryTerms]] /
    * [[graft.operators.Bm25.stats]]). The ingest-time complement of
    * q111: flag arrivals lexically close to benchmark/seed queries the
    * moment they land, before they enter the corpus. ZERO streaming
    * state: the workload collapses to one broadcast row (the
    * streamingLmScore pattern), per-document term frequencies are
    * in-array folds, and the per-query score is the same fixed-point
    * integer sum as the batch operator — bitwise stream ≡ batch
    * ([[graft.operators.Bm25.scorePairs]] with the same stats),
    * proven by StreamBm25Spec.
    *
    * Emits (doc_id, q_id, n_hit, bm25_s, bm25) per arriving document ×
    * query with ≥ 1 matched term. Per-row cost is O(tokens ·
    * workload-terms) — workload-bounded map work, no shuffle. */
  def streamingBm25(docs: DataFrame, qterms: DataFrame,
                    stats: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.Bm25
    import graft.operators.Bm25.Scale
    val wl = qterms
      .groupBy(col("q_id"))
      .agg(collect_list(struct(col("term"), col("df"))).as("terms"))
      .agg(collect_list(struct(col("q_id"), col("terms"))).as("queries"))
      .crossJoin(broadcast(stats))
    def tf(t: org.apache.spark.sql.Column) =
      size(filter(col("tk"), x => x === t)).cast(LongType)
    def score(t: org.apache.spark.sql.Column, df: org.apache.spark.sql.Column) =
      Bm25.scoreExpr(tf(t), col("dl"), df, col("n_docs"), col("avgdl_s"))
    docs
      .withColumn("tk", TextFunctions.tokens(col("text")))
      .filter(size(col("tk")) > 0)
      .withColumn("dl", size(col("tk")).cast(LongType))
      .crossJoin(broadcast(wl)) // stream-static, one row
      .select(col("doc_id"), col("dl"), col("tk"), col("n_docs"),
        col("avgdl_s"), explode(col("queries")).as("q"))
      .withColumn("n_hit",
        size(filter(col("q.terms"), t => tf(t.getField("term")) > 0L))
          .cast(LongType))
      .filter(col("n_hit") > 0)
      .withColumn("bm25_s",
        aggregate(col("q.terms"), lit(0L), (acc, t) =>
          acc + when(tf(t.getField("term")) > 0L,
            score(t.getField("term"), t.getField("df"))).otherwise(lit(0L))))
      .select(col("doc_id"), col("q.q_id").as("q_id"), col("n_hit"),
        col("bm25_s"),
        (col("bm25_s").cast(DoubleType) / lit(Scale).cast(DoubleType)).as("bm25"))
  }

  /** Stream-static decontamination REWRITE — q117's span surgery at
    * ingest: tokens of an arriving document covered by any
    * benchmark-overlapping word 3-gram (start g covers positions
    * g..g+2) are dropped and the cleaned text re-emitted, so
    * benchmark-contaminated spans never enter the corpus. The benchmark
    * hash set collapses to ONE broadcast map row (the streamingLmScore
    * pattern — O(1) per-gram membership); gram hashing, span flags, and
    * the token filter are all per-row array algebra. ZERO streaming
    * state, bitwise stream ≡ batch (StreamDecontamRewriteSpec). */
  def streamingDecontamRewrite(docs: DataFrame, benchHashes: DataFrame,
                               gramWidth: Int = 3): DataFrame = {
    import graft.functions.TextFunctions
    require(gramWidth >= 1, s"gram width must be >= 1; got $gramWidth")
    // distinct() defensively: map_from_entries under the default
    // mapKeyDedupPolicy=EXCEPTION fails at runtime on a duplicate key,
    // so a caller passing a non-deduplicated benchmark hash relation
    // must not blow up the ingest stream. Benchmark-set-sized — free.
    val benchRow = benchHashes.select(col("h")).distinct().agg(
      map_from_entries(array_sort(collect_list(
        struct(col("h"), lit(true))))).as("bench_map"))
    val gramN = (tk: org.apache.spark.sql.Column, g: org.apache.spark.sql.Column) =>
      TextFunctions.strHash(concat_ws(" ",
        (0 until gramWidth).map(j => element_at(tk, g + j)): _*))
    docs
      .withColumn("tk", TextFunctions.tokens(col("text")))
      .crossJoin(broadcast(benchRow)) // stream-static, one row
      .withColumn("cg",
        when(size(col("tk")) >= gramWidth,
          filter(sequence(lit(1), size(col("tk")) - (gramWidth - 1)),
            g => element_at(col("bench_map"), gramN(col("tk"), g)).isNotNull))
          .otherwise(array().cast("array<int>")))
      .withColumn("kept",
        filter(sequence(lit(1), size(col("tk"))),
          i => !exists(col("cg"), g => g <= i && i <= g + lit(gramWidth - 1))))
      .select(col("doc_id"),
        size(col("tk")).cast(LongType).as("n_tok"),
        size(col("cg")).cast(LongType).as("n_contam"),
        (size(col("tk")) - size(col("kept"))).cast(LongType).as("n_dropped"),
        array_join(transform(col("kept"), i => element_at(col("tk"), i)), " ")
          .as("cleaned"))
  }

  /** Live distinct-cardinality tracking — the streaming form of q125's
    * KMV sketch. State per group is the ≤k-element sorted min-hash array
    * itself (~1 KiB); each micro-batch folds its hashes in with the SAME
    * reduce the batch aggregator runs. Because the k smallest distinct
    * values of a set are order-free, the emitted estimate after any
    * prefix of the stream is BITWISE the batch sketch of that prefix —
    * StreamingKmvSpec proves it. Update output mode: every trigger
    * re-emits the groups it touched with their current n_min/h_k/
    * est_distinct (the q125 estimator arithmetic verbatim). */
  def streamingCardinality(rows: Dataset[(String, Long)],
                           k: Int): DataFrame = {
    import rows.sparkSession.implicits._
    val agg = new graft.functions.Sketches.KmvAgg(k)
    val m = graft.functions.TextFunctions.HashMod
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[graft.functions.Sketches.KmvBuf,
        (String, Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (g, it, state) =>
          var buf = state.getOption.getOrElse(agg.zero)
          it.foreach { case (_, h) => buf = agg.reduce(buf, h) }
          state.update(buf)
          if (buf.n == 0) Iterator.empty
          else {
            val hk = buf.data(buf.n - 1)
            val est =
              if (buf.n < k) buf.n.toDouble
              else ((k - 1) * m).toDouble / hk.toDouble
            Iterator.single((g, buf.n.toLong, hk, est))
          }
      }
      .toDF("group", "n_min", "h_k", "est_distinct")
  }

  /** Ingest-time per-group quantile estimates — the streaming form of
    * q130's bottom-k-by-hash sample ([[graft.functions.Sketches
    * .QuantileSketchAgg]]). State per group = the ≤k (hash, value)
    * sample + the running row count: bounded regardless of stream
    * length, and the sample multiset is order-free, so after ANY prefix
    * of the stream the emitted row equals q130's batch arithmetic over
    * that prefix bitwise — however the prefix was micro-batched
    * (StreamingQuantileSpec). Input rows are (group, hash, value);
    * emits (group, n_rows, m, p50_est, p90_est) in Update mode. */
  def streamingQuantiles(rows: Dataset[(String, Long, Double)],
                         k: Int): DataFrame = {
    import rows.sparkSession.implicits._
    val agg = new graft.functions.Sketches.QuantileSketchAgg(k)
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(graft.functions.Sketches.QsBuf, Long),
        (String, Long, Long, Double, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (g, it, state) =>
          var (buf, n) = state.getOption.getOrElse((agg.zero, 0L))
          it.foreach { case (_, h, v) => buf = agg.reduce(buf, (h, v)); n += 1 }
          state.update((buf, n))
          if (buf.n == 0) Iterator.empty
          else {
            // the batch aggregator's own finish (values sorted ascending)
            // + q130's ⌈p·m⌉ nearest-rank integer rule — shared code, so
            // the stream≡batch claim is structural, not coincidental
            val vs = agg.finish(buf)
            val m = vs.length
            Iterator.single((g, n, m.toLong,
              vs((m + 1) / 2 - 1), vs((9 * m + 9) / 10 - 1)))
          }
      }
      .toDF("group", "n_rows", "m", "p50_est", "p90_est")
  }

  /** Ingest-time sessionization — the streaming form of q127's batch
    * `session_window` aggregation, identical row-for-row once the
    * watermark closes a session (SessionWindowSpec proves it against
    * the batch plan). State is one open session per (user, gap-island),
    * evicted when the watermark passes `last event + gap` — no per-user
    * history, which is exactly why this operator (and not the lag/cumsum
    * islands window, which needs a user's full sorted past) is the 100 TB
    * streaming shape. `tsCol` must be a TimestampType column; money is
    * summed in exact integer cents. */
  def streamingSessionize(ev: DataFrame, tsCol: String, userCol: String,
                          centsCol: String, gapSec: Long,
                          watermark: String = "10 minutes"): DataFrame =
    ev.withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), s"$gapSec seconds"))
      .agg(min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col(centsCol)).as("v_cents"))
      .select(col(userCol), col("start_us"), col("end_us"),
        col("n_events"), col("v_cents"))

  /** ST1 sink half: route a drained micro-batch — retrievals to the
    * completed table, failures appended to the dead-letter/retry table
    * (both idempotent by url, giving exactly-once completion markers). */
  def drainBatch(batch: DataFrame, completedPath: String,
                 deadLetterPath: String): Unit = {
    val ready = batch.filter(col("status") === "ready")
    val failed = batch.filter(col("status") === "failed")
    if (!ready.isEmpty)
      ready.write.mode("append").parquet(completedPath)
    if (!failed.isEmpty)
      graft.sources.Sinks.deadLetter(failed, deadLetterPath)
  }
}
