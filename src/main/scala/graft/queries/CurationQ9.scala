package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.Tables
import graft.functions.IntOps.idiv
import graft.functions.Sketches
import graft.functions.TextFunctions._

/** Ninth batch — bounded-state statistics completion and the decontam
  * width ceiling: a MERGEABLE quantile sketch for continuous measures
  * (q130 — per-language quality-score p50/p90 with O(groups·k) state,
  * the continuous-valued sibling of q126's value-grain exact quantiles
  * and q123's fixed terciles), and width-13 benchmark decontamination
  * (q131 — the upper end of the production 8–13 gram range, next to
  * q70's width 3 and q122's width 8).
  */
object CurationQ9 {

  // --------------------------------------------------------------- q130

  /** Sample bound: 256 rows/group → p-quantile rank error concentrates
    * as √(p(1−p)/k) ≈ 3.1% at the median (4 KiB of state per group). */
  private val qsK = 256

  /** Per-language p50/p90 of the composite QUALITY SCORE — a continuous
    * measure, so q126's value-grain histogram degenerates (every double
    * is its own grain) and an exact answer needs a per-language sort of
    * the corpus. The [[graft.functions.Sketches.QuantileSketchAgg]]
    * bottom-k-by-hash sample answers it with bounded state: one
    * map-side-partial groupBy ships ≤k (hash, value) pairs per language
    * — O(groups·k) shuffle bytes at any corpus size — and the quantiles
    * are nearest-rank reads off the ≤k-element sample array. Below k
    * documents the sample is the whole group and the quantiles are
    * EXACT (most long-tail languages); above, SketchesSpec bounds the
    * rank error at 3σ. The oracle derives the identical sample with a
    * rank window over the same portable hash — the corpus-sort plan
    * whose cost the sketch avoids — so the compare is bitwise. */
  private def q130(s: SparkSession, d: String): DataFrame = {
    val (nTokens, sumLen, nStop, nPunct) = qualityCounters(col("toks"), col("text"))
    val scored = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", nTokens)
      .withColumn("sum_len", sumLen)
      .withColumn("n_stop", nStop)
      .withColumn("n_punct", nPunct)
      .filter(col("n_tokens") > 0L)
      .select(col("lang"),
        qualityScore(col("n_tokens"), col("sum_len"), col("n_stop"),
          col("n_punct")).as("q"),
        Sketches.sampleHash(col("doc_id")).as("h"))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        Sketches.quantileSample(col("h"), col("q"), qsK).as("sample"))
      .withColumn("m", size(col("sample")).cast(LongType))
      // nearest-rank ⌈p·m⌉ as pure integer arithmetic (the q126 rule)
      .withColumn("p50_est",
        element_at(col("sample"), idiv(col("m") + 1L, lit(2L)).cast(IntegerType)))
      .withColumn("p90_est",
        element_at(col("sample"), idiv(col("m") * 9L + 9L, lit(10L)).cast(IntegerType)))
      .select(col("lang"), col("n_rows"), col("m"), col("p50_est"), col("p90_est"))
      .orderBy(col("lang"))
  }

  private val q130Sql =
    s"""WITH t AS (SELECT doc_id, lang, text, ${sqlTokens("text")} AS toks
       |  FROM documents),
       |c AS (SELECT doc_id, lang,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (acc, x) -> acc + x) AS sum_len,
       |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS n_stop,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
       |  FROM t),
       |q0 AS (SELECT lang,
       |    (CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.25
       |      + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 2.0
       |      - CAST(n_punct AS DOUBLE) * 0.1 AS q,
       |    ${Sketches.sqlSampleHash("doc_id")} AS h
       |  FROM c WHERE n_tokens > 0),
       |r AS (SELECT lang, q,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h ASC, q ASC) AS rn
       |  FROM q0),
       |n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows FROM q0 GROUP BY lang),
       |sk AS (SELECT lang, list(q ORDER BY q) AS sample,
       |    CAST(COUNT(*) AS BIGINT) AS m
       |  FROM r WHERE rn <= $qsK GROUP BY lang)
       |SELECT sk.lang AS lang, n_rows, m,
       |  sample[CAST((m + 1) // 2 AS INT)] AS p50_est,
       |  sample[CAST((m * 9 + 9) // 10 AS INT)] AS p90_est
       |FROM sk JOIN n ON sk.lang = n.lang ORDER BY lang""".stripMargin

  // --------------------------------------------------------------- q131

  /** The production decontam range's UPPER end (8–13 grams): q122's
    * audit at width 13. A 13-gram hit is a verbatim half-sentence —
    * the narrowest practical leak definition; everything between 8 and
    * 13 is the same plan with a different per-row gram fold. */
  private val q131Width = 13

  /** q70/q122's benchmark-decontamination semantics at width 13 — same
    * broadcast sorted-array + `sorted_intersect_count` kernel, zero
    * corpus shuffle; only the per-row fold widens. Kept as a full audit
    * (zero-overlap rows included, the q122 convention): at width 13
    * genuine overlap is rarer still, and the q70→q122→q131 flag-count
    * descent is the overclaiming story ShingleWidthSpec pins. */
  private def q131(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), wordShingles(col("tk"), q131Width).as("sh"))
    val benchArr = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("h")).distinct()
      .agg(array_sort(collect_set(col("h"))).as("bench_sh"))
    sh.filter(col("doc_id") % 97 =!= 0)
      .crossJoin(broadcast(benchArr))
      .withColumn("n_sh", size(col("sh")).cast(LongType))
      .withColumn("n_overlap",
        call_function("sorted_intersect_count", col("sh"), col("bench_sh")).cast(LongType))
      .withColumn("contam_ratio",
        when(col("n_sh") > 0L,
          col("n_overlap").cast(DoubleType) / col("n_sh").cast(DoubleType))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_sh"), col("n_overlap"), col("contam_ratio"))
      .orderBy(col("doc_id"))
  }

  private val q131Sql =
    s"""WITH tk AS (SELECT doc_id, ${sqlTokens("text")} AS tk FROM documents),
       |sh AS (SELECT doc_id, ${sqlWordShingles("tk", q131Width)} AS sh FROM tk),
       |bench AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 97 = 0),
       |bench_arr AS (SELECT list(h ORDER BY h) AS ba FROM bench),
       |scored AS (SELECT doc_id,
       |    CAST(len(sh) AS BIGINT) AS n_sh,
       |    CAST(len(list_intersect(sh, ba)) AS BIGINT) AS n_overlap
       |  FROM sh CROSS JOIN bench_arr WHERE doc_id % 97 <> 0)
       |SELECT doc_id, n_sh, n_overlap,
       |  CASE WHEN n_sh > 0
       |    THEN CAST(n_overlap AS DOUBLE) / CAST(n_sh AS DOUBLE)
       |    ELSE 0.0 END AS contam_ratio
       |FROM scored ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q133

  /** The deterministic daily-delta rule: every doc with
    * doc_id % 10 = 7 is "today's arrivals" (~10% of the corpus), the
    * rest is the standing corpus — the side split both engines derive
    * identically. */
  private val driftMod = 10L
  private val driftRem = 7L

  /** The scored drift input shared by the batch query and the streaming
    * form's spec: (source, side, q, h) — composite quality score plus
    * the portable sample hash, side per the delta rule. */
  private[graft] def driftScored(s: SparkSession, d: String): DataFrame = {
    val (nTokens, sumLen, nStop, nPunct) = qualityCounters(col("toks"), col("text"))
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", nTokens)
      .withColumn("sum_len", sumLen)
      .withColumn("n_stop", nStop)
      .withColumn("n_punct", nPunct)
      .filter(col("n_tokens") > 0L)
      .select(col("source"),
        when(col("doc_id") % driftMod === driftRem, lit("delta"))
          .otherwise(lit("corpus")).as("side"),
        qualityScore(col("n_tokens"), col("sum_len"), col("n_stop"),
          col("n_punct")).as("q"),
        Sketches.sampleHash(col("doc_id")).as("h"))
  }

  /** PER-SOURCE DISTRIBUTION-DRIFT MONITOR — the operational payoff of
    * q130's sketch: compare the daily delta's quality-score
    * distribution to the standing corpus per source, reporting the
    * p50/p90 shift each source's arrivals would push into the corpus.
    * This is the number a corpus owner watches between curation rounds:
    * a crawler gone bad shows up as one source's delta quantiles
    * detaching from its corpus quantiles days before any aggregate
    * moves.
    *
    * Plan shape: ONE corpus scan → one map-side-partial groupBy
    * (source, side) carrying ≤k (hash, value) pairs per group —
    * O(sources·2·k) shuffle state at any corpus size — then a
    * group-count-sized pivot to columns. Quantiles are the q130
    * nearest-rank reads; shifts are plain differences of the two
    * deterministic sample reads, so the oracle compare stays bitwise.
    * Sources missing a side (no arrivals today) report null deltas and
    * null shifts on both engines. */
  private def q133(s: SparkSession, d: String): DataFrame = {
    val per = driftScored(s, d)
      .groupBy(col("source"), col("side"))
      .agg(count(lit(1)).as("n_rows"),
        Sketches.quantileSample(col("h"), col("q"), qsK).as("sample"))
      .withColumn("m", size(col("sample")).cast(LongType))
      .withColumn("p50",
        element_at(col("sample"), idiv(col("m") + 1L, lit(2L)).cast(IntegerType)))
      .withColumn("p90",
        element_at(col("sample"), idiv(col("m") * 9L + 9L, lit(10L)).cast(IntegerType)))
    per.groupBy(col("source"))
      .agg(
        coalesce(max(when(col("side") === "corpus", col("n_rows"))), lit(0L))
          .as("n_corpus"),
        coalesce(max(when(col("side") === "delta", col("n_rows"))), lit(0L))
          .as("n_delta"),
        max(when(col("side") === "corpus", col("p50"))).as("p50_corpus"),
        max(when(col("side") === "delta", col("p50"))).as("p50_delta"),
        max(when(col("side") === "corpus", col("p90"))).as("p90_corpus"),
        max(when(col("side") === "delta", col("p90"))).as("p90_delta"))
      .withColumn("shift_p50",
        when(col("p50_corpus").isNotNull && col("p50_delta").isNotNull,
          col("p50_delta") - col("p50_corpus")))
      .withColumn("shift_p90",
        when(col("p90_corpus").isNotNull && col("p90_delta").isNotNull,
          col("p90_delta") - col("p90_corpus")))
      .select(col("source"), col("n_corpus"), col("n_delta"),
        col("p50_corpus"), col("p50_delta"), col("shift_p50"),
        col("p90_corpus"), col("p90_delta"), col("shift_p90"))
      .orderBy(col("source"))
  }

  private val q133Sql =
    s"""WITH t AS (SELECT doc_id, source, text, ${sqlTokens("text")} AS toks
       |  FROM documents),
       |c AS (SELECT doc_id, source,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (acc, x) -> acc + x) AS sum_len,
       |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS n_stop,
       |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
       |  FROM t),
       |q0 AS (SELECT source,
       |    CASE WHEN doc_id % $driftMod = $driftRem THEN 'delta' ELSE 'corpus' END AS side,
       |    (CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.25
       |      + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 2.0
       |      - CAST(n_punct AS DOUBLE) * 0.1 AS q,
       |    ${Sketches.sqlSampleHash("doc_id")} AS h
       |  FROM c WHERE n_tokens > 0),
       |r AS (SELECT source, side, q,
       |    ROW_NUMBER() OVER (PARTITION BY source, side ORDER BY h ASC, q ASC) AS rn
       |  FROM q0),
       |n AS (SELECT source, side, CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM q0 GROUP BY source, side),
       |sk AS (SELECT source, side, list(q ORDER BY q) AS sample,
       |    CAST(COUNT(*) AS BIGINT) AS m
       |  FROM r WHERE rn <= $qsK GROUP BY source, side),
       |per AS (SELECT sk.source AS source, sk.side AS side, n_rows, m,
       |    sample[CAST((m + 1) // 2 AS INT)] AS p50,
       |    sample[CAST((m * 9 + 9) // 10 AS INT)] AS p90
       |  FROM sk JOIN n ON sk.source = n.source AND sk.side = n.side),
       |piv AS (SELECT source,
       |    COALESCE(MAX(CASE WHEN side = 'corpus' THEN n_rows END), 0) AS n_corpus,
       |    COALESCE(MAX(CASE WHEN side = 'delta' THEN n_rows END), 0) AS n_delta,
       |    MAX(CASE WHEN side = 'corpus' THEN p50 END) AS p50_corpus,
       |    MAX(CASE WHEN side = 'delta' THEN p50 END) AS p50_delta,
       |    MAX(CASE WHEN side = 'corpus' THEN p90 END) AS p90_corpus,
       |    MAX(CASE WHEN side = 'delta' THEN p90 END) AS p90_delta
       |  FROM per GROUP BY source)
       |SELECT source, n_corpus, n_delta, p50_corpus, p50_delta,
       |  CASE WHEN p50_corpus IS NOT NULL AND p50_delta IS NOT NULL
       |    THEN p50_delta - p50_corpus END AS shift_p50,
       |  p90_corpus, p90_delta,
       |  CASE WHEN p90_corpus IS NOT NULL AND p90_delta IS NOT NULL
       |    THEN p90_delta - p90_corpus END AS shift_p90
       |FROM piv ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q134

  /** q95's IVFADC retrieval over the PERSISTED code table — the q132
    * pattern applied to the PQ production shape: the corpus-resident
    * search state is m code bytes + a cell id per vector
    * ([[graft.operators.PqIndex]], ~32× smaller than the float
    * embeddings), built once per corpus fingerprint and published via
    * AtomicSwap; every later invocation pays only the cell-pruned ADC
    * search. Identical semantics, arithmetic, and ORACLE as q95 (the
    * quantizer row is the shared `CurationQ3.ivfpqQuant`, and
    * PqIndexSpec pins persisted ≡ inline row-for-row) — q95 keeps
    * reporting the self-contained cost, this row the recurring one. */
  private def q134(s: SparkSession, d: String): DataFrame = {
    import graft.operators.PqIndex
    val root = CurationQ7.cachedRoot(s, d, "pq") { tmp =>
      PqIndex.build(Tables.embeddings(s, d), "vec_id", "embedding",
        CurationQ3.ivfpqQuant(s, d), s"$tmp/pq")
    }
    val probes = Tables.embeddings(s, d)
      .filter(col("vec_id") >= CurationQ3.ivfNc &&
        col("vec_id") < CurationQ3.ivfNc + 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    PqIndex.search(s, s"$root/pq", probes, "vec_id",
        k = 10, nprobe = CurationQ3.ivfNprobe)
      .withColumnRenamed("cid", "cell")
      .orderBy(col("q_id"), col("rk"))
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("q130_quantile_sketch", q130, Some(q130Sql), Seq("A5", "A16", "A18")),
    GQuery("q131_decontam_width13", q131, Some(q131Sql), Seq("A16", "J9")),
    GQuery("q133_source_drift", q133, Some(q133Sql), Seq("A5", "A16", "F10")),
    GQuery("q134_indexed_ivfpq", q134, Some(CurationQ3.q95Sql),
      Seq("A16", "O4", "J6")))
}
