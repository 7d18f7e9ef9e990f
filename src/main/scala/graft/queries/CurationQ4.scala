package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import graft.Tables
import graft.functions.TextFunctions._
import SimilarityQ.sqlDotFold

/** Fourth batch of training-data curation operators: model-based quality
  * filtering (a reference-corpus unigram LM, the CCNet recipe's shape),
  * tokenizer-vocabulary induction statistics (BPE), embedding-space
  * benchmark decontamination (the q70 recipe in vector clothing), and
  * semantic-cluster-balanced sampling (the q74 recipe keyed on derived
  * semantic cells instead of a stored language column).
  *
  * Numeric discipline: every score is exact integer arithmetic up to ONE
  * final IEEE division (the q69 rule — no ln(), so no libm divergence
  * between engines), or a dot-product fold whose add order is pinned
  * (`float_dot` ≡ the oracle's list_reduce fold).
  */
object CurationQ4 {

  // ---------------------------------------------------------------- q96

  /** Every 7th document stands in for the high-quality reference corpus
    * the LM is trained on (the CCNet shape: score web text against a
    * Wikipedia-trained LM). */
  private val lmRefMod = 7L

  /** Unigram-LM quality scoring — [[graft.operators.UnigramLm]] run
    * under the oracle gate: the model trains on the reference slice and
    * scores everything else. Rational-arithmetic rationale and scale
    * shape live on the operator; the tf relation is cached because the
    * train and score branches both read it (the q69 contract). */
  private def q96(s: SparkSession, d: String): DataFrame = {
    import graft.operators.UnigramLm
    val tf = UnigramLm.termFreq(Tables.documents(s, d), "doc_id", "text")
      .cache() // read twice: LM-count branch + scoring branch (q69 rule)
    val lm = UnigramLm.train(tf.filter(col("doc_id") % lmRefMod === 0))
    UnigramLm.score(tf.filter(col("doc_id") % lmRefMod =!= 0), lm, "doc_id")
      .orderBy(col("doc_id"))
  }

  private val q96Sql =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term),
       |ref AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c_t
       |  FROM tf WHERE doc_id % $lmRefMod = 0 GROUP BY term),
       |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS c_total, COUNT(*) AS v_size FROM ref),
       |sc AS (SELECT doc_id,
       |    CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |    CAST(SUM(tf * (COALESCE(c_t, 0) + 1)) AS BIGINT) AS l_num,
       |    CAST(SUM(CASE WHEN c_t IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM tf LEFT JOIN ref USING (term)
       |  WHERE doc_id % $lmRefMod <> 0 GROUP BY doc_id)
       |SELECT doc_id, n_tokens, n_oov,
       |  CAST(l_num AS DOUBLE) / CAST(n_tokens * (c_total + v_size) AS DOUBLE) AS mean_p,
       |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_frac,
       |  n_oov * 2 <= n_tokens AS keep
       |FROM sc CROSS JOIN tot ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q97

  private val bpeTopMerges = 20

  /** BPE vocabulary-induction statistics: the first-round adjacent
    * character-pair counts over the word-frequency table, top candidate
    * merges by (count DESC, pair ASC) — [[graft.operators.Bpe]]'s
    * statistics round under the oracle gate (the full sequential trainer
    * is spec-verified; merge selection is inherently round-sequential so
    * only round 1 is SQL-expressible).
    *
    * Scale shape: ONE corpus pass (the word-frequency aggregation);
    * everything after runs over the vocabulary table — map-side pair
    * explode, pair-grain count, TakeOrdered top-k. All-integer. */
  private def q97(s: SparkSession, d: String): DataFrame =
    graft.operators.Bpe
      .pairCounts(graft.operators.Bpe.initVocab(Tables.documents(s, d), "text"))
      .orderBy(col("cnt").desc, col("lft").asc, col("rgt").asc)
      .limit(bpeTopMerges)

  private val q97Sql =
    s"""WITH tk AS (SELECT unnest(${sqlTokens("text")}) AS w FROM documents),
       |wf AS (SELECT w, COUNT(*) AS freq FROM tk GROUP BY w),
       |p AS (SELECT w, freq, CAST(unnest(range(1, length(w))) AS INT) AS i
       |  FROM wf WHERE length(w) >= 2)
       |SELECT substring(w, i, 1) AS lft, substring(w, i + 1, 1) AS rgt,
       |  CAST(SUM(freq) AS BIGINT) AS cnt
       |FROM p GROUP BY 1, 2
       |ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT $bpeTopMerges""".stripMargin

  // ---------------------------------------------------------------- q98

  /** Every 97th vector stands in for the benchmark embedding set (same
    * slice rule as q70's shingle decontamination). */
  private val sdBenchMod = 97L
  /** Flag threshold, chosen above the corpus's inter-cluster cosine
    * floor (max observed cosine at sf0.01 is 0.47; 0.30 flags ~5%). */
  private val sdThreshold = 0.30

  /** Semantic decontamination — [[graft.operators.SemanticDecontam]]
    * run under the oracle gate: every 97th vector is the benchmark set,
    * the rest is the corpus. Broadcast/fold scale shape and tie-break
    * semantics live on the operator. */
  private def q98(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.operators.SemanticDecontam.flag(
        emb.filter(col("vec_id") % sdBenchMod =!= 0),
        emb.filter(col("vec_id") % sdBenchMod === 0),
        "vec_id", "embedding", sdThreshold)
      .orderBy(col("vec_id"))
  }

  private val q98Sql =
    s"""WITH emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS nrm FROM embeddings),
       |vecs AS (SELECT * FROM emb WHERE nrm > 0.0),
       |bench AS (SELECT vec_id AS b_id, embedding AS b_vec, nrm AS b_nrm
       |  FROM vecs WHERE vec_id % $sdBenchMod = 0),
       |sc AS (SELECT c.vec_id AS vec_id, b.b_id AS b_id,
       |    ${sqlDotFold("c.embedding", "b.b_vec")} / (c.nrm * b.b_nrm) AS cos
       |  FROM vecs c CROSS JOIN bench b WHERE c.vec_id % $sdBenchMod <> 0),
       |r AS (SELECT vec_id, b_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, b_id ASC) AS rn
       |  FROM sc)
       |SELECT vec_id, b_id AS bench_id, cos AS max_cos
       |FROM r WHERE rn = 1 AND cos >= $sdThreshold
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q99

  private val csCells = 8
  private val csPerCell = 5

  /** Semantic-cluster-balanced sampling: assign every vector to its
    * nearest of `csCells` cells ([[graft.operators.KMeans.assign]], the
    * q55 quantizer with the lowest-id derived centroids) and keep
    * `csPerCell` per cell in deterministic split-hash order — q74's
    * balanced-sample recipe keyed on a DERIVED semantic cell instead of
    * a stored language column (diversity-preserving downsampling when no
    * taxonomy column exists).
    *
    * Scale shape: centroids broadcast; the assignment argmin and the
    * per-cell rank both plan Partial WindowGroupLimit (each input
    * partition ships ≤ k rows per key — asserted for this family by
    * PlanContractSpec), so nothing corpus-sized crosses an exchange. */
  private def q99(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cents = emb.filter(col("vec_id") < csCells)
      .select(col("vec_id").cast(IntegerType).as("cid"),
        col("embedding").as("centroid"))
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("h").asc, col("vec_id").asc)
    graft.operators.KMeans.assign(emb, "vec_id", "embedding", cents)
      .withColumn("h",
        strHash(concat(lit("csample:"), col("vec_id").cast(StringType))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= csPerCell)
      .select(col("cid"), col("rk"), col("vec_id"), col("h"))
      .orderBy(col("cid"), col("rk"))
  }

  private val q99Sql = {
    val h = sqlStrHash("concat('csample:', CAST(vec_id AS VARCHAR))")
    s"""WITH emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS nrm FROM embeddings),
       |vecs AS (SELECT * FROM emb WHERE nrm > 0.0),
       |c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS c_vec, nrm AS c_norm
       |  FROM vecs WHERE vec_id < $csCells),
       |a0 AS (SELECT v.vec_id AS vec_id, c.cid AS cid,
       |    ${sqlDotFold("v.embedding", "c.c_vec")} / (v.nrm * c.c_norm) AS cos
       |  FROM vecs v CROSS JOIN c),
       |ar AS (SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
       |  FROM a0),
       |asg AS (SELECT vec_id, cid FROM ar WHERE rn = 1),
       |hs AS (SELECT vec_id, cid, $h AS h FROM asg),
       |r AS (SELECT cid, vec_id, h,
       |    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY h ASC, vec_id ASC) AS rk
       |  FROM hs)
       |SELECT cid, rk, vec_id, h FROM r WHERE rk <= $csPerCell
       |ORDER BY cid, rk""".stripMargin
  }

  // --------------------------------------------------------------- q100

  /** Joint text+vector curation: the battery-4 operators composed the
    * way a corpus owner runs them — [[graft.operators.UnigramLm]] keeps
    * the text side (reference-LM likelihood + OOV gate),
    * [[graft.operators.SemanticDecontam]] flags the embedding side
    * (cosine proximity to the benchmark set), and the per-document
    * verdict joins the two on the shared id (`vec_id` is the document's
    * embedding id). `final_keep` = LM keep AND not contaminated — the
    * multimodal analog of q79's quality→decontam→dedup verdict chain.
    *
    * Scale shape: both stages keep their own contracts (broadcast vocab
    * dim; broadcast bench array, zero corpus shuffle); the verdict join
    * is keyed on the doc id — a corpus-growing grain, linear — and the
    * flagged side is output-sized (contaminated docs only). Nullable
    * join columns are coalesced to sentinel values so the verdict table
    * is dense (and the oracle compare bitwise). */
  private def q100(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{SemanticDecontam, UnigramLm}
    val tf = UnigramLm.termFreq(Tables.documents(s, d), "doc_id", "text")
      .cache() // read twice: LM-count branch + scoring branch (q69 rule)
    val lm = UnigramLm.train(tf.filter(col("doc_id") % lmRefMod === 0))
    val scored =
      UnigramLm.score(tf.filter(col("doc_id") % lmRefMod =!= 0), lm, "doc_id")
    val emb = Tables.embeddings(s, d)
    val flagged = SemanticDecontam.flag(
        emb.filter(col("vec_id") % sdBenchMod =!= 0),
        emb.filter(col("vec_id") % sdBenchMod === 0),
        "vec_id", "embedding", sdThreshold)
      .withColumnRenamed("vec_id", "doc_id")
    scored.withColumnRenamed("keep", "keep_lm")
      .join(flagged, Seq("doc_id"), "left")
      .withColumn("contaminated", col("bench_id").isNotNull)
      .withColumn("final_keep", col("keep_lm") && !col("contaminated"))
      .select(col("doc_id"), col("n_tokens"), col("mean_p"), col("keep_lm"),
        col("contaminated"), coalesce(col("bench_id"), lit(-1L)).as("bench_id"),
        coalesce(col("max_cos"), lit(-1.0)).as("max_cos"), col("final_keep"))
      .orderBy(col("doc_id"))
  }

  private val q100Sql =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term),
       |ref AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c_t
       |  FROM tf WHERE doc_id % $lmRefMod = 0 GROUP BY term),
       |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS c_total, COUNT(*) AS v_size FROM ref),
       |sc AS (SELECT doc_id,
       |    CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |    CAST(SUM(tf * (COALESCE(c_t, 0) + 1)) AS BIGINT) AS l_num,
       |    CAST(SUM(CASE WHEN c_t IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM tf LEFT JOIN ref USING (term)
       |  WHERE doc_id % $lmRefMod <> 0 GROUP BY doc_id),
       |scored AS (SELECT doc_id, n_tokens,
       |    CAST(l_num AS DOUBLE) / CAST(n_tokens * (c_total + v_size) AS DOUBLE) AS mean_p,
       |    n_oov * 2 <= n_tokens AS keep_lm
       |  FROM sc CROSS JOIN tot),
       |emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS nrm FROM embeddings),
       |vecs AS (SELECT * FROM emb WHERE nrm > 0.0),
       |bench AS (SELECT vec_id AS b_id, embedding AS b_vec, nrm AS b_nrm
       |  FROM vecs WHERE vec_id % $sdBenchMod = 0),
       |cosr AS (SELECT c.vec_id AS vec_id, b.b_id AS b_id,
       |    ${sqlDotFold("c.embedding", "b.b_vec")} / (c.nrm * b.b_nrm) AS cos
       |  FROM vecs c CROSS JOIN bench b WHERE c.vec_id % $sdBenchMod <> 0),
       |rk AS (SELECT vec_id, b_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, b_id ASC) AS rn
       |  FROM cosr),
       |flagged AS (SELECT vec_id AS doc_id, b_id AS bench_id, cos AS max_cos
       |  FROM rk WHERE rn = 1 AND cos >= $sdThreshold)
       |SELECT s.doc_id AS doc_id, s.n_tokens AS n_tokens, s.mean_p AS mean_p,
       |  s.keep_lm AS keep_lm,
       |  f.bench_id IS NOT NULL AS contaminated,
       |  COALESCE(f.bench_id, -1) AS bench_id,
       |  COALESCE(f.max_cos, -1.0) AS max_cos,
       |  s.keep_lm AND f.bench_id IS NULL AS final_keep
       |FROM scored s LEFT JOIN flagged f USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q101

  private val rsProbeLo = 8L
  private val rsProbeN = 4
  private val rsNprobe = 2
  private val rsThreshold = 0.30

  /** Cell-blocked cosine RANGE search — the inline form of
    * [[graft.operators.VecIndex.rangeSearch]] under the oracle gate
    * (VecIndexSpec proves persisted ≡ inline): corpus vectors assign to
    * their nearest cell (the q55 quantizer), probes take their
    * `rsNprobe` nearest cells, and every in-cell pair at or above the
    * threshold is emitted — an open-ended match set, so there is NO
    * top-k window anywhere, just the assignment argmin and a filter.
    * Self-matches are kept (the decontamination semantics).
    *
    * Scale shape: centroids and the probe-cell table broadcast; on the
    * persisted index the same plan partition-prunes to the probed
    * cells. */
  private def q101(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(call_function("float_dot", col("embedding"), col("embedding")))
          .as("nrm"))
      .filter(col("nrm") > 0.0)
    val cents = emb.filter(col("vec_id") < csCells)
      .select(col("vec_id").cast(IntegerType).as("cid"),
        col("embedding").as("c_vec"), col("nrm").as("c_norm"))
    def assigned(df: DataFrame, nprobe: Int) = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("cid").asc)
      df.crossJoin(broadcast(cents))
        .withColumn("c_cos",
          call_function("float_dot", col("embedding"), col("c_vec")) /
            (col("nrm") * col("c_norm")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= nprobe)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
    }
    val corpus = assigned(emb, 1)
    val probes = assigned(
        emb.filter(col("vec_id") >= rsProbeLo &&
          col("vec_id") < rsProbeLo + rsProbeN), rsNprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("nrm").as("q_nrm"), col("cid"))
    corpus.join(broadcast(probes), Seq("cid"))
      .withColumn("cos",
        call_function("float_dot", col("embedding"), col("q_vec")) /
          (col("nrm") * col("q_nrm")))
      .filter(col("cos") >= rsThreshold)
      .select(col("q_id"), col("vec_id"), col("cid"), col("cos"))
      .orderBy(col("q_id"), col("vec_id"))
  }

  private val q101Sql =
    s"""WITH emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS nrm FROM embeddings),
       |vecs AS (SELECT * FROM emb WHERE nrm > 0.0),
       |c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS c_vec, nrm AS c_norm
       |  FROM vecs WHERE vec_id < $csCells),
       |a0 AS (SELECT v.vec_id AS vec_id, v.embedding AS embedding, v.nrm AS nrm,
       |    c.cid AS cid,
       |    ${sqlDotFold("v.embedding", "c.c_vec")} / (v.nrm * c.c_norm) AS c_cos
       |  FROM vecs v CROSS JOIN c),
       |ar AS (SELECT vec_id, embedding, nrm, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY c_cos DESC, cid ASC) AS rn
       |  FROM a0),
       |corpus AS (SELECT vec_id, embedding, nrm, cid FROM ar WHERE rn = 1),
       |probes AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm, cid
       |  FROM ar WHERE rn <= $rsNprobe
       |    AND vec_id >= $rsProbeLo AND vec_id < $rsProbeLo + $rsProbeN),
       |m AS (SELECT p.q_id AS q_id, x.vec_id AS vec_id, x.cid AS cid,
       |    ${sqlDotFold("x.embedding", "p.q_vec")} / (x.nrm * p.q_nrm) AS cos
       |  FROM corpus x JOIN probes p ON x.cid = p.cid)
       |SELECT q_id, vec_id, cid, cos FROM m WHERE cos >= $rsThreshold
       |ORDER BY q_id, vec_id""".stripMargin

  // --------------------------------------------------------------- q102

  /** Temperature-scaled mixture weights — the multilingual/multi-domain
    * α-sampling recipe (q_s ∝ p_s^α): up-weight low-resource sources,
    * down-weight dominant ones, α = 1/2 so the power IS `sqrt` — the
    * one transcendental-free exponent, correctly rounded by IEEE 754 in
    * every engine (the C2-tier ln/pow divergence never arises). The
    * renormalizing Σ√p folds over the source-ORDERED weight array (the
    * q58/q59 sorted-fold rule) so the IEEE add order is
    * engine-identical; everything upstream is exact integers with one
    * division per ratio.
    *
    * Scale shape: one corpus pass (source-keyed token totals, partial
    * aggregation); everything after runs on the source dimension —
    * a handful of rows. `boost` = q_s/p_s is the per-source replication
    * factor a sampler (q86's copy planner) consumes. */
  private def q102(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val bySrc = Tables.documents(s, d)
      .select(col("source"), size(tokens(col("text"))).cast(LongType).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = bySrc.agg(sum(col("n_tokens")).as("tok_tot"))
    val dim = bySrc.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_tokens").cast(DoubleType) / col("tok_tot").cast(DoubleType))
      .withColumn("temp_w", sqrt(col("share")))
    // Σ√p in source order: sorted fold, bitwise-portable
    val wSum = dim
      .agg(array_sort(collect_list(struct(col("source"), col("temp_w")))).as("ws"))
      .select(aggregate(col("ws"), lit(0.0),
        (acc, x) => acc + x.getField("temp_w")).as("w_sum"))
    dim.crossJoin(broadcast(wSum))
      .withColumn("q_share", col("temp_w") / col("w_sum"))
      .withColumn("boost", col("q_share") / col("share"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
        col("temp_w"), col("q_share"), col("boost"))
      .orderBy(col("source"))
  }

  private[queries] val q102Sql =
    s"""WITH docs AS (SELECT source,
       |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tok FROM documents),
       |by_src AS (SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |  FROM docs GROUP BY source),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok_tot FROM by_src),
       |dim AS (SELECT source, n_docs, n_tokens,
       |    CAST(n_tokens AS DOUBLE) / CAST(tok_tot AS DOUBLE) AS share,
       |    sqrt(CAST(n_tokens AS DOUBLE) / CAST(tok_tot AS DOUBLE)) AS temp_w
       |  FROM by_src CROSS JOIN tot),
       |ws AS (SELECT list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE), list(temp_w ORDER BY source)),
       |    (acc, x) -> acc + x) AS w_sum FROM dim)
       |SELECT source, n_docs, n_tokens, share, temp_w,
       |  temp_w / w_sum AS q_share,
       |  (temp_w / w_sum) / share AS boost
       |FROM dim CROSS JOIN ws ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q103

  private val faCells = 16
  private val faProbeLo = 16L
  private val faProbeN = 8
  private val faTopK = 10

  /** Filtered ANN: IVF top-k where each probe searches only corpus
    * vectors satisfying a metadata predicate — here `label = the
    * probe's own label` (nearest neighbors within my class, the
    * within-language-dedup shape). PRE-filter semantics: the predicate
    * lands in the search join's condition, BEFORE the top-k window, so
    * the result is the true top-k of the filtered set (post-filtering a
    * plain top-k would silently return < k rows and miss matches — the
    * classic vector-DB recall bug).
    *
    * Scale shape: q55's exactly — centroids and probes broadcast, the
    * only shuffle is the cell-keyed search join, and the predicate is a
    * join residual evaluated on the (partition-pruned, on the persisted
    * index) cell scan; WindowGroupLimit still pre-prunes the top-k. On
    * a `VecIndex` layout a high-selectivity label could be a second
    * partition column, turning the residual into more pruning. */
  private def q103(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label"),
        sqrt(call_function("float_dot", col("embedding"), col("embedding")))
          .as("nrm"))
      .filter(col("nrm") > 0.0)
    val cents = emb.filter(col("vec_id") < faCells)
      .select(col("vec_id").cast(IntegerType).as("cid"),
        col("embedding").as("c_vec"), col("nrm").as("c_norm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cid").asc)
    val assign = emb.crossJoin(broadcast(cents))
      .withColumn("c_cos",
        call_function("float_dot", col("embedding"), col("c_vec")) /
          (col("nrm") * col("c_norm")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("label"), col("nrm"),
        col("cid"))
    val probes = assign
      .filter(col("vec_id") >= faProbeLo && col("vec_id") < faProbeLo + faProbeN)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"), col("nrm").as("q_nrm"),
        col("cid").as("q_cid"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    assign.join(broadcast(probes),
        col("cid") === col("q_cid") && col("vec_id") =!= col("q_id") &&
          col("label") === col("q_label"))
      .withColumn("cos",
        call_function("float_dot", col("embedding"), col("q_vec")) /
          (col("nrm") * col("q_nrm")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= faTopK)
      .select(col("q_id"), col("rk"), col("vec_id"), col("label"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  private val q103Sql =
    s"""WITH emb AS (SELECT vec_id, embedding, label,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS nrm FROM embeddings),
       |vecs AS (SELECT * FROM emb WHERE nrm > 0.0),
       |c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS c_vec, nrm AS c_norm
       |  FROM vecs WHERE vec_id < $faCells),
       |a0 AS (SELECT v.vec_id AS vec_id, v.embedding AS embedding,
       |    v.label AS label, v.nrm AS nrm, c.cid AS cid,
       |    ${sqlDotFold("v.embedding", "c.c_vec")} / (v.nrm * c.c_norm) AS c_cos
       |  FROM vecs v CROSS JOIN c),
       |ar AS (SELECT vec_id, embedding, label, nrm, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY c_cos DESC, cid ASC) AS rn
       |  FROM a0),
       |asg AS (SELECT vec_id, embedding, label, nrm, cid FROM ar WHERE rn = 1),
       |probes AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label,
       |    nrm AS q_nrm, cid AS q_cid
       |  FROM asg WHERE vec_id >= $faProbeLo AND vec_id < $faProbeLo + $faProbeN),
       |scored AS (SELECT p.q_id AS q_id, x.vec_id AS vec_id, x.label AS label,
       |    ${sqlDotFold("x.embedding", "p.q_vec")} / (x.nrm * p.q_nrm) AS cos
       |  FROM asg x JOIN probes p ON x.cid = p.q_cid AND x.vec_id <> p.q_id
       |    AND x.label = p.q_label),
       |ranked AS (SELECT q_id, vec_id, label, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, rk, vec_id, label, cos FROM ranked WHERE rk <= $faTopK
       |ORDER BY q_id, rk""".stripMargin

  // --------------------------------------------------------------- q104

  private val spCtx = 256
  private val spChunk = 32
  private val spShards = 4

  /** Chunked sequence packing — the split-documents packing mode: q84's
    * non-overlapping token chunking feeds q88's sharded running-sum
    * bin-fill, so a long document SPLITS across context bins instead of
    * overflowing one (q88 packs whole docs; the contiguous-packing
    * tradeoff there is `fill > 1` truncation). With chunk ≤ 32 and
    * ctx = 256, a bin's fill can exceed 1 by at most one chunk tail —
    * the per-bin waste bound a training-data owner actually budgets.
    * A document's chunks stay contiguous within its shard (ordered by
    * doc hash, then chunk start).
    *
    * Scale shape: chunking is a map-side explode (zero shuffle, q84's
    * contract); packing is the q88 sharded window — the running sum
    * never sees more than one (lang, shard) slice, with shard count ∝
    * corpus / target-partition-size in production. */
  private def q104(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc, col("start").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("lang"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(spChunk))).as("start"))
      .withColumn("chunk_len",
        least(lit(spChunk), col("n") - col("start")).cast(LongType))
      .withColumn("shard",
        (strHash(concat(lit("pack:"), col("doc_id").cast(StringType))) % spShards)
          .cast(IntegerType))
      .withColumn("h",
        strHash(concat(lit("order:"), col("doc_id").cast(StringType))))
      .withColumn("cum", sum(col("chunk_len")).over(w))
      // FLOOR, not a cast: DuckDB's double→int cast rounds, Spark's
      // truncates — FLOOR is the portable spelling (the q88 rule)
      .withColumn("bin",
        floor((col("cum") - col("chunk_len")) / lit(spCtx.toDouble)))
      .groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("chunk_len")).as("n_tokens"))
      .withColumn("fill",
        col("n_tokens").cast(DoubleType) / lit(spCtx.toDouble))
      .orderBy(col("lang"), col("shard"), col("bin"))
  }

  private val q104Sql = {
    val shardHash = sqlStrHash("'pack:' || CAST(doc_id AS VARCHAR)")
    val orderHash = sqlStrHash("'order:' || CAST(doc_id AS VARCHAR)")
    s"""WITH tk AS (SELECT doc_id, lang, ${sqlTokens("text")} AS tk FROM documents),
       |d AS (SELECT doc_id, lang, len(tk) AS n FROM tk WHERE len(tk) > 0),
       |ch AS (SELECT doc_id, lang, n,
       |    CAST(unnest(range(0, n, $spChunk)) AS BIGINT) AS start FROM d),
       |cl AS (SELECT doc_id, lang, start,
       |    CAST(LEAST($spChunk, n - start) AS BIGINT) AS chunk_len,
       |    CAST($shardHash % $spShards AS INT) AS shard,
       |    $orderHash AS h
       |  FROM ch),
       |c AS (SELECT lang, shard, doc_id, chunk_len,
       |    SUM(chunk_len) OVER (PARTITION BY lang, shard
       |      ORDER BY h ASC, doc_id ASC, start ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM cl),
       |b AS (SELECT lang, shard, doc_id, chunk_len,
       |    CAST(FLOOR((cum - chunk_len) / $spCtx.0) AS BIGINT) AS bin FROM c)
       |SELECT lang, shard, bin, COUNT(*) AS n_chunks,
       |  COUNT(DISTINCT doc_id) AS n_docs,
       |  CAST(SUM(chunk_len) AS BIGINT) AS n_tokens,
       |  CAST(SUM(chunk_len) AS DOUBLE) / $spCtx.0 AS fill
       |FROM b GROUP BY lang, shard, bin
       |ORDER BY lang, shard, bin""".stripMargin
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("q96_unigram_lm", q96, Some(q96Sql), Seq("A16", "A17", "F6")),
    GQuery("q97_bpe_pairs", q97, Some(q97Sql), Seq("A17", "O4", "C12")),
    GQuery("q98_semantic_decontam", q98, Some(q98Sql), Seq("A16", "J9")),
    GQuery("q99_cluster_sample", q99, Some(q99Sql), Seq("W5", "A16", "O4")),
    GQuery("q100_joint_curation", q100, Some(q100Sql), Seq("A16", "J6", "U1")),
    GQuery("q101_cell_range_search", q101, Some(q101Sql), Seq("A16", "J9", "J10")),
    GQuery("q102_temperature_mixture", q102, Some(q102Sql), Seq("A16", "A17", "J6")),
    GQuery("q103_filtered_ann", q103, Some(q103Sql), Seq("A16", "J9", "O1")),
    GQuery("q104_chunked_packing", q104, Some(q104Sql), Seq("W5", "A17", "F11")))
}
