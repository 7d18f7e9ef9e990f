package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import graft.Tables
import graft.functions.IntOps.idiv
import graft.functions.Sketches
import graft.functions.TextFunctions._
import QueryDsl.{d2, sqlD2}

/** Eighth batch — corpus-statistics and quality depth: bounded-memory
  * distinct-cardinality estimation (q125 — KMV sketch, the map-side
  * answer to "how many distinct shingles per language" that exact
  * `count_distinct` turns into a corpus-grain shuffle), exact quantiles
  * at VALUE grain (q126 — per-language token-count p50/p90 without a
  * document-grain sort), native session windows (q127 — the
  * Structured-Streaming-capable sessionization operator next to q11's
  * batch lag/cumsum islands), and Gopher-style repetition signals
  * (q128 — zero-shuffle per-document repetition fractions, the quality
  * filter family of Rae et al. 2021 §A1.1).
  */
object CurationQ8 {

  // --------------------------------------------------------------- q125

  /** KMV buffer bound: 128 hashes → ~1/√(k−2) ≈ 9% relative standard
    * error on the estimate, 1 KiB of state per group. */
  private val kmvK = 128

  /** Distinct word-3-gram shingle cardinality per language, estimated by
    * the [[graft.functions.Sketches.kmvMinK]] K-minimum-values sketch.
    *
    * Scale shape: exact `count_distinct(shingle)` shuffles every
    * (lang, shingle) pair — at 100 TB that is the corpus itself, keyed
    * by a handful of languages (a skew disaster on top of the volume).
    * The KMV aggregator partial-aggregates map-side: each task emits one
    * ≤128-element sorted array per language and the merge is a bounded
    * array union, so the shuffle is O(languages · k) bytes no matter the
    * corpus size. Below k distinct values the answer is exact; above, the
    * unbiased (k−1)·M/h_k estimator applies (SketchesSpec bounds the
    * relative error at 3σ against the exact count). The oracle derives
    * the identical min-k set with a rank window — the exact plan whose
    * cost the sketch exists to avoid — so n_min/h_k compare bitwise and
    * the estimate is one deterministic IEEE division of exact integers. */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val tk = Tables.documents(s, d)
      .select(col("lang"), tokens(col("text")).as("tk"))
    val sh = tk.select(col("lang"), explode(wordShingles3(col("tk"))).as("h"))
    sh.groupBy(col("lang"))
      .agg(Sketches.kmvMinK(col("h"), kmvK).as("mins"))
      .withColumn("n_min", size(col("mins")).cast(LongType))
      .withColumn("h_k", element_at(col("mins"), size(col("mins"))))
      .withColumn("est_distinct",
        when(col("n_min") < kmvK, col("n_min").cast(DoubleType))
          .otherwise(lit((kmvK - 1) * HashMod).cast(DoubleType) /
            col("h_k").cast(DoubleType)))
      .select(col("lang"), col("n_min"), col("h_k"), col("est_distinct"))
      .orderBy(col("lang"))
  }

  private val q125Sql =
    s"""WITH tk AS (SELECT lang, ${sqlTokens("text")} AS tk FROM documents),
       |sh AS (SELECT lang, unnest(${sqlWordShingles("tk", 3)}) AS h FROM tk),
       |d AS (SELECT DISTINCT lang, h FROM sh),
       |r AS (SELECT lang, h,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h ASC) AS rn FROM d),
       |m AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_min, MAX(h) AS h_k
       |  FROM r WHERE rn <= $kmvK GROUP BY lang)
       |SELECT lang, n_min, h_k,
       |  CASE WHEN n_min < $kmvK THEN CAST(n_min AS DOUBLE)
       |    ELSE CAST(${(kmvK - 1) * HashMod} AS DOUBLE) / CAST(h_k AS DOUBLE)
       |  END AS est_distinct
       |FROM m ORDER BY lang""".stripMargin

  // --------------------------------------------------------------- q126

  /** Exact per-language token-count quantiles (p50/p90, nearest-rank:
    * smallest value v with cum_count(≤v) ≥ ⌈q·n⌉) — computed at VALUE
    * grain, the scale-correct shape for exact quantiles of a
    * low-cardinality measure.
    *
    * Scale shape: the naive exact plan ranks every document inside a
    * per-language window — a corpus-grain sort with a billion-row
    * partition for a dominant language. Here documents first aggregate
    * to (lang, n_tok) counts — a normal partial-aggregated groupBy —
    * and the rank window runs over the VALUE histogram, whose
    * cardinality is bounded by the number of distinct document lengths
    * (thousands), independent of corpus size. The ⌈q·n⌉ thresholds are
    * the integer predicates 2·cum ≥ n and 10·cum ≥ 9·n — exact on both
    * engines, no floating-point rank arithmetic. */
  private def q126(s: SparkSession, d: String): DataFrame = {
    val nt = Tables.documents(s, d)
      .select(col("lang"), col("text"))
      .select(col("lang"), size(tokens(col("text"))).cast(LongType).as("n_tok"))
    val hist = nt.groupBy(col("lang"), col("n_tok")).agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("lang")).orderBy(col("n_tok").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("c")).over(wc))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(max(col("n")).as("n_docs"),
        min(when(col("cum") * 2 >= col("n"), col("n_tok"))).as("p50_tok"),
        min(when(col("cum") * 10 >= col("n") * 9, col("n_tok"))).as("p90_tok"))
      .orderBy(col("lang"))
  }

  private val q126Sql =
    s"""WITH nt AS (SELECT lang, CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |h AS (SELECT lang, n_tok, COUNT(*) AS c FROM nt GROUP BY lang, n_tok),
       |w AS (SELECT lang, n_tok, c,
       |    SUM(c) OVER (PARTITION BY lang ORDER BY n_tok ASC
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(c) OVER (PARTITION BY lang) AS n
       |  FROM h)
       |SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
       |  MIN(CASE WHEN cum * 2 >= n THEN n_tok END) AS p50_tok,
       |  MIN(CASE WHEN cum * 10 >= n * 9 THEN n_tok END) AS p90_tok
       |FROM w GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------------------------------------- q127

  /** Session gap: two events of a user belong to one session iff they
    * are at most 10 minutes apart (inclusive — the session_window merge
    * rule, pinned by SessionWindowSpec). */
  private val sessGapSec = 600L

  /** User sessionization with Spark's NATIVE `session_window` — the
    * Structured-Streaming-capable form of q11's lag/cumsum islands.
    *
    * Why a second sessionization shape: the islands window needs every
    * event of a user in one sorted window partition — fine in batch, but
    * it has no incremental form. `session_window` is the operator the
    * STREAMING pipeline runs (watermark-evicted per-session state, no
    * per-user history), so the batch battery must pin its semantics:
    * SessionWindowSpec proves the streaming run produces these exact
    * rows, and the boundary contract (a gap of exactly 600 s DOES merge
    * — Spark merges when the next event touches the previous [ts,
    * ts+gap] bound, so a session breaks only on a STRICTLY greater gap)
    * is asserted there and mirrored by the oracle's `<= gap` same-session
    * rule. Money sums are fixed-point cents (exact BIGINT on both
    * engines); session start/end are reported as min/max event micros,
    * not the engine-specific window bounds. */
  private def q127(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      idiv(col("ts_ns"), lit(1000L)).as("ts_us"),
      (d2(col("value")) * 100).cast(LongType).as("cents"))
    ev.withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("ts"), s"$sessGapSec seconds"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"), sum(col("cents")).as("v_cents"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("v_cents"))
      .orderBy(col("user_id"), col("start_us"))
  }

  private val q127Sql =
    s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
       |    CAST(${sqlD2("value")} * 100 AS BIGINT) AS cents FROM events),
       |o AS (SELECT user_id, ts_us, cents,
       |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
       |        ORDER BY ts_us) <= ${sessGapSec * 1000000L} THEN 0 ELSE 1 END AS brk
       |  FROM e),
       |g AS (SELECT user_id, ts_us, cents,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM o)
       |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       |  CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(cents) AS BIGINT) AS v_cents
       |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  // --------------------------------------------------------------- q128

  /** Per-document repetition signals (the Gopher repetition-filter
    * family): the most-frequent-token fraction and the duplicate
    * word-2-gram fraction. A document dominated by one token or by
    * repeated 2-grams is boilerplate/spam; curation pipelines threshold
    * on these before any model-based scoring.
    *
    * Scale shape: ZERO shuffle — both signals are pure per-row array
    * algebra inside whole-stage codegen. The top-token count is the max
    * run length of the SORTED token array, computed by one `aggregate`
    * fold (the mode of a multiset = longest equal-run of its sorted
    * form), not an explode→groupBy over token occurrences; the 2-gram
    * signal compares the raw 2-gram count to its distinct count. The
    * oracle computes the same mode by unnest+groupBy — the relational
    * plan whose occurrence-grain shuffle the fold avoids. */
  private def q128(s: SparkSession, d: String): DataFrame = {
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    // tk/st/g2 must be materialized attributes: per-element lambdas over a
    // non-attribute subtree re-evaluate it per index (the wordShingles trap)
    val arr = tk.select(col("doc_id"), col("tk"),
      array_sort(col("tk")).as("st"),
      when(size(col("tk")) >= 2,
        transform(sequence(lit(1), size(col("tk")) - 1),
          g => concat_ws(" ", element_at(col("tk"), g), element_at(col("tk"), g + 1))))
        .otherwise(array().cast(ArrayType(StringType))).as("g2"))
    val maxRun = aggregate(
      col("st"),
      struct(lit(null).cast(StringType).as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, t) => {
        val run2 = when(acc.getField("prev") === t, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run2.as("run"),
          greatest(acc.getField("best"), run2).as("best"))
      },
      acc => acc.getField("best"))
    def frac(num: Column, den: Column): Column =
      when(den > 0L, num.cast(DoubleType) / den.cast(DoubleType)).otherwise(lit(0.0))
    arr.withColumn("n_tok", size(col("tk")).cast(LongType))
      .withColumn("max_run", maxRun)
      .withColumn("n_2g", size(col("g2")).cast(LongType))
      .withColumn("n_dup2",
        (size(col("g2")) - size(array_distinct(col("g2")))).cast(LongType))
      .select(col("doc_id"), col("n_tok"), col("max_run"),
        frac(col("max_run"), col("n_tok")).as("top_tok_frac"),
        col("n_2g"), col("n_dup2"),
        frac(col("n_dup2"), col("n_2g")).as("dup_2g_frac"))
      .orderBy(col("doc_id"))
  }

  private val q128Sql =
    s"""WITH tk AS (SELECT doc_id, ${sqlTokens("text")} AS tk FROM documents),
       |occ AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
       |mode AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_run FROM (
       |    SELECT doc_id, tok, COUNT(*) AS c FROM occ GROUP BY doc_id, tok)
       |  GROUP BY doc_id),
       |g2 AS (SELECT doc_id,
       |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
       |      g -> concat_ws(' ', tk[g], tk[g+1]))
       |    ELSE CAST([] AS VARCHAR[]) END AS sh
       |  FROM tk),
       |m AS (SELECT t.doc_id AS doc_id,
       |    CAST(len(t.tk) AS BIGINT) AS n_tok,
       |    COALESCE(mode.max_run, 0) AS max_run,
       |    CAST(len(g2.sh) AS BIGINT) AS n_2g,
       |    CAST(len(g2.sh) - len(list_distinct(g2.sh)) AS BIGINT) AS n_dup2
       |  FROM tk t LEFT JOIN mode ON t.doc_id = mode.doc_id
       |    JOIN g2 ON t.doc_id = g2.doc_id)
       |SELECT doc_id, n_tok, max_run,
       |  CASE WHEN n_tok > 0 THEN CAST(max_run AS DOUBLE) / CAST(n_tok AS DOUBLE)
       |    ELSE 0.0 END AS top_tok_frac,
       |  n_2g, n_dup2,
       |  CASE WHEN n_2g > 0 THEN CAST(n_dup2 AS DOUBLE) / CAST(n_2g AS DOUBLE)
       |    ELSE 0.0 END AS dup_2g_frac
       |FROM m ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q129

  /** Pairwise corpus-overlap matrix between sources, from KMV sketches
    * alone — the "how much of source A is also in source B" question a
    * mixture designer asks before weighting sources, answered WITHOUT a
    * pairwise corpus join.
    *
    * Sketch theory: the k smallest of minK(A) ∪ minK(B) ARE minK(A ∪ B)
    * (any hash that small is in its own set's min-k), so the union
    * estimator needs only the two sketches; and an element of that
    * merged min-k lies in A ∩ B iff it appears in BOTH sketches (it is
    * ≤ h_k(A∪B) ≤ each sketch's own cutoff), so K∩/k' is an unbiased
    * Jaccard estimate (Beyer et al. 2007). Below k the sketches are the
    * exact distinct sets and both outputs are exact.
    *
    * Scale shape: the corpus is touched ONCE (the per-source sketch
    * groupBy, map-side partial); the S² pair stage joins S sketch rows
    * of ~1 KiB each — broadcast, array algebra only. The naive exact
    * plan is S² shingle-grain joins over the corpus. */
  private def q129(s: SparkSession, d: String): DataFrame = {
    val tk = Tables.documents(s, d)
      .select(col("source"), tokens(col("text")).as("tk"))
    val sh = tk.select(col("source"), explode(wordShingles3(col("tk"))).as("h"))
    val sk = sh.groupBy(col("source"))
      .agg(Sketches.kmvMinK(col("h"), kmvK).as("mins"))
    val a = sk.select(col("source").as("src_a"), col("mins").as("ma"))
    val b = sk.select(col("source").as("src_b"), col("mins").as("mb"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("mu", slice(array_sort(array_union(col("ma"), col("mb"))), 1, kmvK))
      .withColumn("k_union", size(col("mu")).cast(LongType))
      .withColumn("h_k", element_at(col("mu"), size(col("mu"))))
      .withColumn("k_inter",
        size(filter(array_intersect(col("ma"), col("mb")),
          v => v <= col("h_k"))).cast(LongType))
      .withColumn("jac_est",
        col("k_inter").cast(DoubleType) / col("k_union").cast(DoubleType))
      .withColumn("union_est",
        when(col("k_union") < kmvK, col("k_union").cast(DoubleType))
          .otherwise(lit((kmvK - 1) * HashMod).cast(DoubleType) /
            col("h_k").cast(DoubleType)))
      .select(col("src_a"), col("src_b"), col("k_union"), col("h_k"),
        col("k_inter"), col("jac_est"), col("union_est"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val q129Sql =
    s"""WITH tk AS (SELECT source, ${sqlTokens("text")} AS tk FROM documents),
       |sh AS (SELECT source, unnest(${sqlWordShingles("tk", 3)}) AS h FROM tk),
       |d AS (SELECT DISTINCT source, h FROM sh),
       |r AS (SELECT source, h,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS rn FROM d),
       |sk AS (SELECT source, list(h ORDER BY h) AS mins
       |  FROM r WHERE rn <= $kmvK GROUP BY source),
       |p AS (SELECT a.source AS src_a, b.source AS src_b,
       |    a.mins AS ma, b.mins AS mb
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |c AS (SELECT src_a, src_b, ma, mb,
       |    (list_sort(list_distinct(ma || mb)))[1:$kmvK] AS mu FROM p),
       |e AS (SELECT src_a, src_b,
       |    CAST(len(mu) AS BIGINT) AS k_union, mu[len(mu)] AS h_k,
       |    CAST(len(list_filter(list_intersect(ma, mb),
       |      v -> v <= mu[len(mu)])) AS BIGINT) AS k_inter
       |  FROM c)
       |SELECT src_a, src_b, k_union, h_k, k_inter,
       |  CAST(k_inter AS DOUBLE) / CAST(k_union AS DOUBLE) AS jac_est,
       |  CASE WHEN k_union < $kmvK THEN CAST(k_union AS DOUBLE)
       |    ELSE CAST(${(kmvK - 1) * HashMod} AS DOUBLE) / CAST(h_k AS DOUBLE)
       |  END AS union_est
       |FROM e ORDER BY src_a, src_b""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q125_kmv_cardinality", q125, Some(q125Sql), Seq("A16", "A17")),
    GQuery("q126_exact_quantiles", q126, Some(q126Sql), Seq("A5", "A18")),
    GQuery("q127_session_window", q127, Some(q127Sql), Seq("W1", "W2", "ST2")),
    GQuery("q128_repetition_signals", q128, Some(q128Sql), Seq("F6", "A16")),
    GQuery("q129_source_overlap", q129, Some(q129Sql), Seq("A16", "A17", "J6")))
}
