package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import graft.functions.TextFunctions._

/** End-to-end training-data curation: the batch battery's stages
  * (quality q28, decontamination q70, LSH near-dup q32 + keep-best q73,
  * stratified split q71) composed into the pipeline a corpus owner
  * actually runs. Each stage is the SAME operator the oracle-paired
  * query verifies — this file only sequences them.
  *
  * Decision semantics (each doc gets every verdict, so downstream
  * auditing can ask "why was this dropped"):
  *  - `quality_pass`   — composite score ≥ cfg.minQuality;
  *  - `contam_pass`    — shingle overlap ratio with the benchmark set
  *    ≤ cfg.maxContamRatio (benchmark docs themselves never pass);
  *  - `dedup_keep`     — the doc is its near-dup component's
  *    best-quality member. Near-dup pairing runs over the docs that
  *    passed quality+contamination (dropped docs must not keep a good
  *    doc out of the corpus);
  *  - `split`          — deterministic hash split for the final keeps,
  *    null otherwise.
  *
  * Scale shape: quality + contamination are map-side (the benchmark
  * shingle set broadcasts as one sorted array); near-dup is the bucketed
  * LSH join; the component decision is the iterative min-label
  * propagation; the split is a pure row function. No stage collects.
  */
object Curation {

  /** @param broadcastPairDims force-broadcast the near-dup stage's
    *        doc/signature dims (measured fastest through the sf1-eq
    *        probe; candidate sets are quality-filtered, so they run
    *        well below the raw corpus). Set false past the broadcast
    *        ceiling: Catalyst then plans the co-located shuffle join,
    *        proven result-identical by PlanContractSpec.
    * @param maxBroadcastShingles size switch for the decontamination
    *        stage: a benchmark whose DISTINCT shingle set fits under
    *        this count collapses to one sorted broadcast array (pure
    *        map work on the corpus); past it — a real eval-suite union
    *        can exceed any single-row/broadcast ceiling — the overlap
    *        runs as a shingle-keyed join instead (see
    *        [[Curation.overlapJoin]]), proven result-identical by
    *        DecontamFallbackSpec. 5M longs ≈ 40 MB serialized, an
    *        order of magnitude under the broadcast limit.
    * @param shingleWidth word-n-gram width for the decontamination
    *        overlap (the [[graft.functions.TextFunctions.wordShingles]]
    *        n). 3 is the battery default and the q70 contract;
    *        production benchmark decontamination typically runs 8–13
    *        (8 is oracle-paired as q122) — wider grams stop common
    *        phrases from overclaiming contamination. Like every Config
    *        knob, the width is a POLICY: prev tables and benchmarks
    *        must have been produced with the same value. */
  final case class Config(
      minQuality: Double = 0.0,
      maxContamRatio: Double = 0.5,
      jaccardThreshold: Double = 0.5,
      trainBuckets: Int = 8, // of 10: 8/1/1 train/val/test
      splitSalt: String = "split:",
      broadcastPairDims: Boolean = true,
      maxBroadcastShingles: Long = 5000000L,
      shingleWidth: Int = 3)

  /** Shared scoring stage (quality + contamination verdicts) — the
    * map-side front of both the full and the incremental pipeline.
    * Returned PERSISTED: every caller fans out into multiple consumers
    * (near-dup pair generation, the keep-best side, the failed branch)
    * that would each re-run the tokenize + shingle + benchmark-intersect
    * chain (measured 10.6 s → 4 s at sf0.1). At fleet scale this is the
    * point where a corpus pipeline WRITES the scored relation to
    * storage between stages — a persisted intermediate is the honest
    * in-session analog, unlike a query-side corpus cache (the q76
    * lesson: queries over an index must not own corpus-sized state). */
  private def score(docs: DataFrame, benchmark: DataFrame,
                    cfg: Config): (DataFrame, DataFrame) = {
    val (nTokens, sumLen, nStop, nPunct) = qualityCounters(col("tk"), col("text"))
    // the size switch: counting the DISTINCT benchmark shingles is an
    // action, but on the small-by-definition side — the eval suite —
    // and it is exactly the number the broadcast ceiling is about. The
    // relation is PERSISTED across the switch so the chosen branch reads
    // the counted rows instead of re-running tokenize+shingle+distinct
    // over the benchmark (one pass, not two — the count() materializes
    // the cache). The scored relation itself stays LAZY: an eager
    // materialization here was measured +4 s on q89 (it splits the first
    // consumer's pipelined compute-and-cache job into a separate full
    // pass), so the benchSh handle is returned for the caller to release
    // once scored HAS materialized (curateIncremental) or left to the
    // session-cache policy (curate — the pairs-cleanup convention).
    val benchSh = benchShingles(benchmark, cfg.shingleWidth).persist()
    val useBroadcast = benchSh.count() <= cfg.maxBroadcastShingles
    val withSh = docs
      .withColumn("tk", tokens(col("text")))
      .withColumn("quality", qualityScore(nTokens, sumLen, nStop, nPunct))
      .withColumn("sh", wordShingles(col("tk"), cfg.shingleWidth))
      // the near-dup signature base (SimilarityQ.hashedTokenSets's exact
      // expression over the SAME tk), carried on the persisted scored
      // relation so the pair stages never re-run tokenize+hash over the
      // candidates (round 14, VERDICT #3 — one full tokenize pass per
      // curation query). At fleet scale this is the signature column a
      // corpus pipeline writes next to the decision columns.
      .withColumn("__toks",
        array_sort(array_distinct(transform(array_distinct(col("tk")), strHash(_)))))
      .withColumn("__n", size(col("__toks")).cast(LongType))
      .drop("tk")
    val overlapped =
      if (useBroadcast) overlapBroadcast(withSh, benchSh)
      else overlapJoin(withSh, benchSh)
    val scored = overlapped
      .withColumn("contam_ratio",
        when(size(col("sh")) > 0,
          col("n_overlap").cast(DoubleType) / size(col("sh")).cast(DoubleType))
          .otherwise(0.0))
      .drop("sh", "n_overlap")
      .withColumn("quality_pass", col("quality") >= cfg.minQuality)
      .withColumn("contam_pass", col("contam_ratio") <= cfg.maxContamRatio)
      .persist()
    (scored, benchSh)
  }

  /** The benchmark's distinct shingle relation — one row per n-gram
    * hash. At fleet scale this is a table a suite owner maintains
    * (optionally bucketed on `h`, which [[overlapJoin]] exploits). */
  private[graft] def benchShingles(benchmark: DataFrame, width: Int = 3): DataFrame =
    benchmark
      .select(tokens(col("text")).as("tk"))
      .select(explode(wordShingles(col("tk"), width)).as("h")).distinct()

  /** Overlap count, broadcast form: the shingle relation collapses to
    * ONE sorted array broadcast to every task; the corpus side is pure
    * map work through the `sorted_intersect_count` codegen kernel —
    * zero corpus shuffle, the fastest shape while the benchmark fits. */
  private[graft] def overlapBroadcast(withSh: DataFrame, benchSh: DataFrame): DataFrame =
    withSh
      .crossJoin(broadcast(benchSh.agg(array_sort(collect_set(col("h"))).as("bench_sh"))))
      .withColumn("n_overlap",
        call_function("sorted_intersect_count", col("sh"), col("bench_sh")).cast(LongType))
      .drop("bench_sh")

  /** Overlap count past the broadcast ceiling: explode the corpus
    * shingles to (doc_id, h) grain and join the benchmark relation on
    * the shingle hash — per-doc `sh` arrays are distinct, so one joined
    * row per shared shingle and `count(*)` per doc IS the intersection
    * size (bit-identical to the kernel; DecontamFallbackSpec asserts
    * it). The corpus pays ONE keyed shuffle at shingle grain; a
    * benchmark table bucketed on `h` (`Bucketing.persistBucketed`)
    * joins without shuffling its own side. Docs sharing nothing drop
    * out of the inner join and rejoin as n_overlap = 0. */
  private[graft] def overlapJoin(withSh: DataFrame, benchSh: DataFrame): DataFrame = {
    val counts = withSh
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .join(benchSh, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_overlap"))
    withSh
      .join(counts, Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
  }

  /** @param docs      corpus (doc_id, text, …) — extra columns pass through
    * @param benchmark eval-suite documents (doc_id, text)
    * @return one row per corpus doc with quality, contam_ratio,
    *         component, the three verdicts, `split`, and `keep` */
  def curate(docs: DataFrame, benchmark: DataFrame, cfg: Config = Config()): DataFrame =
    curateWithSignatures(docs, benchmark, cfg)._1

  /** [[curate]] plus the CANDIDATE signature sets (doc_id, toks, n) the
    * decision run already computed — so an incremental caller (q89)
    * builds its persisted signature index from the scored cache instead
    * of re-tokenizing the candidate corpus a third time (round 14,
    * VERDICT #3). */
  private[graft] def curateWithSignatures(docs: DataFrame, benchmark: DataFrame,
                                          cfg: Config = Config()): (DataFrame, DataFrame) = {
    val (scored, _) = score(docs, benchmark, cfg)
    val candidates = scored.filter(col("quality_pass") && col("contam_pass"))
    val candSets = candidates
      .select(col("doc_id"), col("__toks").as("toks"), col("__n").as("n"))
    // scoped (unsorted) pair form: keepBest consumes the pairs as an edge
    // set, so the registry query's output ordering would be a wasted
    // shuffle here. The cleanup thunk is intentionally NOT invoked — the
    // full pipeline's result is lazy (callers write/compare it once per
    // session) and the harnesses clearCache() between runs
    val (pairs, _) = graft.queries.SimilarityQ
      .lshNearDupPairsFromSets(candSets,
        hinted = cfg.broadcastPairDims, threshold = cfg.jaccardThreshold)
    val kept = graft.operators.DedupGroups
      .keepBest(candidates.drop("__toks", "__n"), "doc_id", "quality",
        pairs, "doc_a", "doc_b")
      .withColumnRenamed("keep", "dedup_keep")
    val failed = scored.filter(!(col("quality_pass") && col("contam_pass")))
      .drop("__toks", "__n")
      .withColumn("component", col("doc_id"))
      .withColumn("dedup_keep", lit(false))
    (finalizeDecisions(kept.unionByName(failed), cfg), candSets)
  }

  /** keep + deterministic split over assembled verdict rows — one
    * definition shared by the full and incremental pipelines. */
  private def finalizeDecisions(rows: DataFrame, cfg: Config): DataFrame = {
    val h = strHash(concat(lit(cfg.splitSalt), col("doc_id").cast(StringType))) % 10
    rows
      .withColumn("keep", col("quality_pass") && col("contam_pass") && col("dedup_keep"))
      .withColumn("split",
        when(!col("keep"), lit(null).cast(StringType))
          .when(h < cfg.trainBuckets, "train")
          .when(h === cfg.trainBuckets, "val")
          .otherwise("test"))
  }

  /** The decision-table schema — the one definition q89 and the
    * equivalence spec select against (drift between the three call
    * sites would silently narrow the cross-engine compare). */
  private[graft] val DecisionCols = Seq("doc_id", "quality", "contam_ratio",
    "quality_pass", "contam_pass", "component", "dedup_keep", "keep", "split")

  /** Daily-delta curation: yesterday's decision table + today's new
    * documents → the updated decision table, recomputing ONLY the new
    * docs and the existing components they touch. The incremental run
    * never re-reads old corpus text: old docs participate through the
    * persisted signature index (near-dup pairing) and their prior
    * decision rows (quality for keep-best, flags for assembly) — daily
    * work is ∝ new data + touched components, not corpus size.
    *
    * Equivalence contract (asserted by IncrementalCurationSpec):
    * `curateIncremental(curate(A), index(A-candidates), B)` row-equals
    * `curate(A ∪ B)`. It holds because (a) scoring is per-doc, (b) LSH
    * band signatures are per-doc, so A-internal pairs are unchanged and
    * A–B pairs are exactly the index probes, and (c) connectivity of
    * touched components is preserved by star edges (member → component
    * id): a component's min id always survives as its own label.
    *
    * Storage lifecycle: the returned table is materialized eagerly
    * (localCheckpoint) and every per-call cache — score(), both pair
    * sets, the keep decisions — is released before returning, so a
    * long-lived daily driver can invoke this per delta without
    * accumulating executor storage. `prev`/`prevIndex` are caller-owned
    * and untouched.
    *
    * @param prev      prior decision table (the 9 decision columns;
    *                  doc ids disjoint from `newDocs`), produced with
    *                  the SAME cfg — a changed quality bar, threshold,
    *                  split salt, or bucket count would silently mix
    *                  two policies in one table
    * @param prevIndex `StreamOps.signatureIndex` over the prior run's
    *                  CANDIDATES (docs passing quality + contamination)
    * @param newDocs   today's arrivals (doc_id, text)
    * @param benchmark the SAME eval-suite set the prior run used */
  def curateIncremental(prev: DataFrame, prevIndex: DataFrame,
                        newDocs: DataFrame, benchmark: DataFrame,
                        cfg: Config = Config()): DataFrame = {
    val delta = curateIncrementalDelta(prev, prevIndex, newDocs, benchmark, cfg)
    // the full-table form: delta rows replace their ids, everything
    // else passes through — note the anti-join makes THIS composition
    // corpus-sized; the daily driver persists the delta at partition
    // grain instead and never materializes the union
    delta.unionByName(
      prev.join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(DecisionCols.map(col): _*))
      .localCheckpoint(true)
  }

  /** [[curateIncremental]]'s DELTA: exactly the rows whose decision the
    * arrivals can change — every arrival, plus every member of a prior
    * component an arrival near-dups into (re-decided; rows outside
    * those components are untouched by construction, see the
    * equivalence argument above). Delta-sized compute AND delta-sized
    * output: the one corpus-proportional touch is the column-pruned
    * scan of `prev` that finds the affected components' members. The
    * daily driver joins this against its batch-partitioned decision
    * table to rewrite only the partitions holding these ids. Returned
    * materialized (localCheckpoint), per-call caches released — the
    * same storage lifecycle as the full form. */
  def curateIncrementalDelta(prev: DataFrame, prevIndex: DataFrame,
                             newDocs: DataFrame, benchmark: DataFrame,
                             cfg: Config = Config()): DataFrame = {
    val (scored, benchSh) = score(newDocs, benchmark, cfg)
    val candNew = scored.filter(col("quality_pass") && col("contam_pass"))
    // the scoring pass's signature sets feed BOTH pair stages — the
    // round-13 shape re-ran tokenize+hash over the candidates twice
    // here (new-new LSH and new-old index probe; round 14, VERDICT #3)
    val candNewSets = candNew
      .select(col("doc_id"), col("__toks").as("toks"), col("__n").as("n"))
    val (pairsNewNewRaw, releasePairs) = graft.queries.SimilarityQ
      .lshNearDupPairsFromSets(candNewSets,
        hinted = cfg.broadcastPairDims, threshold = cfg.jaccardThreshold)
    val pairsNewNew = pairsNewNewRaw.select(col("doc_a"), col("doc_b"))
    val pairsNewOld = graft.streaming.StreamOps
      .streamingNearDupFromSets(candNewSets, prevIndex,
        cfg.jaccardThreshold)
      .select(col("doc_id").as("doc_a"), col("dup_of").as("doc_b"))
      .persist() // consumed by the affected-component scan AND the edge set
    val prevCand = prev.filter(col("quality_pass") && col("contam_pass"))
    val affected = pairsNewOld.select(col("doc_b").as("doc_id")).distinct()
      .join(prevCand.select(col("doc_id"), col("component")), Seq("doc_id"))
      .select(col("component")).distinct()
    val touchedOld = prevCand.join(affected, Seq("component"))
      .select(col("doc_id"), col("quality"), col("component"),
        col("contam_ratio"), col("quality_pass"), col("contam_pass"))
      .persist()
    // star edges preserve old-component connectivity without re-verifying
    // old-old pairs: the component id IS a member (its min), so
    // member→component edges reproduce the original component exactly
    val starEdges = touchedOld.filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("doc_a"), col("component").as("doc_b"))
    val allPairs = pairsNewNew.unionByName(pairsNewOld).unionByName(starEdges)
    val members = candNew.select(col("doc_id"), col("quality"))
      .unionByName(touchedOld.select(col("doc_id"), col("quality")))
    val kept = graft.operators.DedupGroups
      .keepBest(members, "doc_id", "quality", allPairs, "doc_a", "doc_b")
      .withColumnRenamed("keep", "dedup_keep")
      .persist() // consumed by the new-rows and old-rows assemblies
    // one flag source for both member kinds — new candidates and touched
    // old docs contribute the same flag columns
    val flags = candNew.select(col("doc_id"), col("contam_ratio"),
        col("quality_pass"), col("contam_pass"))
      .unionByName(touchedOld.select(col("doc_id"), col("contam_ratio"),
        col("quality_pass"), col("contam_pass")))
    val keptRows = kept.join(flags, Seq("doc_id"))
    val failedNew = scored
      .filter(!(col("quality_pass") && col("contam_pass")))
      .select(col("doc_id"), col("quality"), col("contam_ratio"),
        col("quality_pass"), col("contam_pass"))
      .withColumn("component", col("doc_id"))
      .withColumn("dedup_keep", lit(false))
    val result = finalizeDecisions(keptRows.unionByName(failedNew), cfg)
      .select(DecisionCols.map(col): _*)
    // Materialize the delta ONCE (9 narrow columns, no text —
    // localCheckpoint is the in-session analog of the storage write a
    // fleet pipeline does here, and it truncates the lineage that
    // referenced the per-call caches), then release every intermediate
    // this invocation pinned. A daily driver calls this per delta;
    // without the release each run would leak executor storage
    // (the GetFlaggedTiles discipline, at corpus scale).
    val out = result.localCheckpoint(true)
    releasePairs()
    pairsNewOld.unpersist()
    touchedOld.unpersist()
    kept.unpersist()
    scored.unpersist()
    benchSh.unpersist()
    out
  }

  /** Takedown-curation — [[curateIncremental]]'s inverse: remove
    * `victims` from a decision table and re-decide exactly the rows
    * their absence can change, the members of the components a
    * CANDIDATE victim leaves. Per-doc verdicts (quality, contamination,
    * the split hash) never reference other documents and are untouched;
    * only the near-dup structure moves — a component that loses its
    * kept member must elect a new survivor, and one that loses a
    * CONNECTING member may split into several components, each then
    * keeping its own best.
    *
    * Exactness and locality: near-dup pairs are pair-local (two docs
    * share a band bucket and pass the Jaccard verify, or they don't —
    * no third document participates), so removing a victim can never
    * CREATE an edge, and every surviving edge joins two members of one
    * old component (a cross-component edge would have merged the
    * components when first computed). Re-running the pair computation
    * over the affected components' surviving members alone therefore
    * reproduces exactly what a full rerun over corpus-minus-victims
    * decides for them, and every other row is untouched:
    * `forget(curate(A), V, A) ≡ curate(A ∖ V)` row-for-row
    * (ForgetSpec; q136 pins it cross-engine against the DuckDB oracle
    * over the filtered corpus).
    *
    * Cost ∝ victims' components, never corpus size: the only
    * corpus-sized input is the by-id probe into `docs` for the
    * surviving members' text (the semi-join a text store serves
    * without a scan when doc-id-clustered).
    *
    * @param prev    decision table produced with the SAME cfg
    * @param victims (doc_id) rows to forget — ids absent from `prev`
    *                are ignored
    * @param docs    corpus (doc_id, text) — read ONLY for the affected
    *                components' surviving members */
  def forget(prev: DataFrame, victims: DataFrame, docs: DataFrame,
             cfg: Config = Config()): DataFrame = {
    val vIds = victims.select(col("doc_id")).distinct().localCheckpoint(true)
    val redecided = forgetDelta(prev, vIds, docs, cfg)
    // full-table composition (corpus-sized anti-joins — the daily
    // driver persists the delta at partition grain instead)
    val untouched = prev
      .join(vIds, Seq("doc_id"), "left_anti")
      .join(redecided.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(DecisionCols.map(col): _*)
    redecided.unionByName(untouched).localCheckpoint(true)
  }

  /** [[forget]]'s DELTA: the re-decided rows — every surviving member
    * of a component a candidate victim leaves (victims themselves are
    * simply ABSENT; the caller drops them). Exactness argument above;
    * delta-sized output, returned materialized with per-call caches
    * released. `victims` should be pre-deduplicated ids. */
  def forgetDelta(prev: DataFrame, vIds: DataFrame, docs: DataFrame,
                  cfg: Config = Config()): DataFrame = {
    val affected = prev.join(vIds, Seq("doc_id"), "left_semi")
      .filter(col("quality_pass") && col("contam_pass"))
      .select(col("component")).distinct()
    val remaining = prev
      .filter(col("quality_pass") && col("contam_pass"))
      .join(affected, Seq("component"), "left_semi")
      .join(vIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality"), col("contam_ratio"),
        col("quality_pass"), col("contam_pass"))
      .persist()
    val remText = docs.select(col("doc_id"), col("text"))
      .join(remaining.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val (pairs, releasePairs) = graft.queries.SimilarityQ
      .lshNearDupPairsScoped(remText, hinted = cfg.broadcastPairDims,
        threshold = cfg.jaccardThreshold)
    val kept = graft.operators.DedupGroups
      .keepBest(remaining.select(col("doc_id"), col("quality")), "doc_id",
        "quality", pairs.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
      .withColumnRenamed("keep", "dedup_keep")
    val out = finalizeDecisions(
      kept.join(remaining.select(col("doc_id"), col("contam_ratio"),
        col("quality_pass"), col("contam_pass")), Seq("doc_id")), cfg)
      .select(DecisionCols.map(col): _*)
      .localCheckpoint(true)
    releasePairs()
    remaining.unpersist()
    out
  }
}
