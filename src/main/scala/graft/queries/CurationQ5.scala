package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}
import graft.Tables
import graft.functions.TextFunctions._

/** Fifth batch of training-data curation operators: hashed-n-gram
  * importance resampling (the DSIR recipe's shape — score raw documents
  * by how target-like their hashed feature profile is), a trained
  * multinomial Naive Bayes classifier (the fastText-classifier role:
  * train on a labeled slice, predict the rest), token-balanced shard
  * assignment for data loaders (serpentine bin packing), and
  * content-defined chunking (rolling-hash boundaries, the CDC dedup
  * primitive).
  *
  * Numeric discipline (the battery-4 rule): every score is exact
  * integer arithmetic up to final IEEE divisions/multiplies in a PINNED
  * parenthesization — no ln()/pow(), so no libm divergence between
  * engines. DSIR's log-likelihood-ratio and NB's log-posterior are
  * replaced by their arithmetic-mean-likelihood surrogates, the same
  * monotone substitution [[graft.operators.UnigramLm]] makes for
  * log-perplexity (mean smoothed probability instead of geometric
  * mean), with the same-denominator trick keeping each side a single
  * integer-ratio pair.
  */
object CurationQ5 {

  // --------------------------------------------------------------- q105

  /** Hashed feature-space size. Smoothing adds +1 per bucket, so the
    * denominators are N + B with B the FULL space, not the observed
    * bucket count — portable across slices that miss buckets. */
  private val dsirBuckets = 64L
  /** Selection depth per source shard (DSIR selects within shards in
    * practice; a global top-k would be an unkeyed window). */
  private val dsirPerSource = 3

  /** DSIR-style importance resampling: hash every unigram and bigram
    * into `dsirBuckets` buckets, estimate the target distribution from
    * the `lang = 'en'` slice and the raw distribution from the whole
    * corpus, and score each document by the ratio of its mean smoothed
    * bucket probability under target vs raw:
    *
    *   importance = (Σ_b c_b·(n_t[b]+1)) / (Σ_b c_b·(n_r[b]+1))
    *                · (N_r + B) / (N_t + B)
    *
    * — exact integers up to two divisions and one multiply (the
    * same-denominator trick: all target buckets share D_t = N_t + B).
    * `selected` marks the per-source top-`dsirPerSource` by importance,
    * the deterministic stand-in for DSIR's Gumbel top-k (seeded noise
    * would need ln()).
    *
    * Scale shape: ONE corpus pass to the (doc, bucket) grain (cached —
    * the bucket dimension and the per-doc fold both read it, the q69
    * rule); the bucket dimension is B rows and broadcasts; the rank
    * window is keyed by source. Overflow headroom: c_b·(n_r[b]+1) ≤
    * per-doc features (~10⁴) × corpus features (~10¹³ at 100 TB) < 2⁶³
    * per term is NOT safe pointwise — but the per-doc SUM is bounded by
    * n_feats·(N_r+1) ~ 10⁴·10¹³ = 10¹⁷ < 2⁶³, same headroom class as
    * UnigramLm. */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val B = dsirBuckets
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        tokens(col("text")).as("tk"))
    // tk is an attribute here, so the per-element lambdas below do not
    // re-split the document (the wordShingles3 contract)
    val uni = transform(col("tk"), t => strHash(t) % B)
    val bi = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => strHash(concat_ws(" ",
          element_at(col("tk"), i), element_at(col("tk"), i + 1))) % B))
      .otherwise(array().cast(ArrayType(LongType)))
    val feats = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(concat(uni, bi)).as("b"))
      .cache() // read twice: bucket dimension + per-doc fold (q69 rule)
    val dim = feats.groupBy(col("b"))
      .agg(count(lit(1)).as("n_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_t"))
    val tot = dim.agg(sum(col("n_r")).as("nr_tot"), sum(col("n_t")).as("nt_tot"))
    val perDoc = feats
      .groupBy(col("doc_id"), col("lang"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(dim), Seq("b"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * (col("n_t") + 1L)).as("num"),
        sum(col("c") * (col("n_r") + 1L)).as("den"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("importance").desc, col("doc_id").asc)
    perDoc.crossJoin(broadcast(tot))
      .withColumn("importance",
        (col("num").cast(DoubleType) / col("den").cast(DoubleType)) *
          ((col("nr_tot") + B).cast(DoubleType) /
            (col("nt_tot") + B).cast(DoubleType)))
      .withColumn("rk", row_number().over(w))
      .withColumn("selected", col("rk") <= dsirPerSource)
      .select(col("doc_id"), col("lang"), col("source"), col("n_feats"),
        col("importance"), col("rk"), col("selected"))
      .orderBy(col("doc_id"))
  }

  private val q105Sql = {
    val B = dsirBuckets
    val bg = sqlStrHash("tk[p] || ' ' || tk[p + 1]")
    s"""WITH tkl AS (SELECT doc_id, lang, source, ${sqlTokens("text")} AS tk
       |  FROM documents),
       |f AS (SELECT doc_id, lang, source, unnest(list_concat(
       |    list_transform(tk, t -> ${sqlStrHash("t")} % $B),
       |    CASE WHEN len(tk) >= 2 THEN
       |      list_transform(range(1, len(tk)), p -> $bg % $B)
       |    ELSE CAST([] AS BIGINT[]) END)) AS b
       |  FROM tkl),
       |dim AS (SELECT b, COUNT(*) AS n_r,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_t
       |  FROM f GROUP BY b),
       |tot AS (SELECT CAST(SUM(n_r) AS BIGINT) AS nr_tot,
       |    CAST(SUM(n_t) AS BIGINT) AS nt_tot FROM dim),
       |db AS (SELECT doc_id, lang, source, b, COUNT(*) AS c
       |  FROM f GROUP BY doc_id, lang, source, b),
       |pd AS (SELECT doc_id, lang, source,
       |    CAST(SUM(c) AS BIGINT) AS n_feats,
       |    CAST(SUM(c * (n_t + 1)) AS BIGINT) AS num,
       |    CAST(SUM(c * (n_r + 1)) AS BIGINT) AS den
       |  FROM db JOIN dim USING (b) GROUP BY doc_id, lang, source),
       |sc AS (SELECT doc_id, lang, source, n_feats,
       |    (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) *
       |      (CAST(nr_tot + $B AS DOUBLE) / CAST(nt_tot + $B AS DOUBLE))
       |      AS importance
       |  FROM pd CROSS JOIN tot),
       |r AS (SELECT doc_id, lang, source, n_feats, importance,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY importance DESC, doc_id ASC) AS rk
       |  FROM sc)
       |SELECT doc_id, lang, source, n_feats, importance, rk,
       |  rk <= $dsirPerSource AS selected
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q106

  /** Every 3rd document is the labeled training slice. */
  private val nbTrainMod = 3L

  /** Trained multinomial Naive Bayes language classifier — the trained
    * counterpart of q27's n-gram heuristic (the fastText-classifier
    * role in curation stacks: train on a labeled slice, predict
    * everything else). Per class c the posterior surrogate is
    *
    *   score_c = (d_c + 1)/(d_tot + n_cls)           (prior)
    *           · (Σ_t tf_t·(c_{c,t}+1)) / (n·(N_c + V))   (likelihood)
    *
    * — add-1-smoothed mean token probability instead of the geometric
    * mean (the UnigramLm substitution), each factor an integer ratio,
    * the product's parenthesization pinned. `predicted` is the argmax
    * with ties broken by class name — a per-document window over
    * `n_cls` rows.
    *
    * Scale shape: one corpus pass to the (doc, lang, term) tf grain
    * (cached: train and test branches both read it); the trained model
    * (class × term counts) is a vocabulary-sized dimension that
    * BROADCASTS into the scoring join, class totals are `n_cls` rows;
    * the argmax window is keyed by doc_id with n_cls rows per key. */
  private def q106(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cache() // read twice: train-count branch + scoring branch (q69 rule)
    val classTerm = tf.filter(col("doc_id") % nbTrainMod === 0)
      .groupBy(col("lang").as("cls"), col("term"))
      .agg(sum(col("tf")).as("c_ct"))
      .cache() // class×vocab-sized model; read thrice: class totals,
               // vocab size, scoring broadcast (q69 rule)
    val classTok = classTerm.groupBy(col("cls")).agg(sum(col("c_ct")).as("n_c"))
    val classDocs = docs.filter(col("doc_id") % nbTrainMod === 0)
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("d_c"))
    val trainTot = classDocs
      .agg(sum(col("d_c")).as("d_tot"), count(lit(1)).as("n_cls"))
    val vdim = classTerm.agg(count_distinct(col("term")).as("v_size"))
    val classDim = classTok.join(classDocs, Seq("cls"))
      .crossJoin(trainTot).crossJoin(vdim)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls").asc)
    tf.filter(col("doc_id") % nbTrainMod =!= 0)
      .withColumnRenamed("lang", "actual")
      .crossJoin(broadcast(classDim))
      .join(broadcast(classTerm), Seq("term", "cls"), "left")
      .groupBy(col("doc_id"), col("actual"), col("cls"), col("n_c"),
        col("d_c"), col("d_tot"), col("n_cls"), col("v_size"))
      .agg(sum(col("tf") * (coalesce(col("c_ct"), lit(0L)) + 1L)).as("num"),
        sum(col("tf")).as("n"))
      .withColumn("score",
        ((col("d_c") + 1L).cast(DoubleType) /
          (col("d_tot") + col("n_cls")).cast(DoubleType)) *
          (col("num").cast(DoubleType) /
            (col("n") * (col("n_c") + col("v_size"))).cast(DoubleType)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("actual"), col("cls").as("predicted"),
        col("score"), (col("cls") === col("actual")).as("correct"))
      .orderBy(col("doc_id"))
  }

  private[queries] val q106Sql =
    s"""WITH tk AS (SELECT doc_id, lang, unnest(${sqlTokens("text")}) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, lang, term, COUNT(*) AS tf
       |  FROM tk GROUP BY doc_id, lang, term),
       |ct AS (SELECT lang AS cls, term, CAST(SUM(tf) AS BIGINT) AS c_ct
       |  FROM tf WHERE doc_id % $nbTrainMod = 0 GROUP BY lang, term),
       |ctot AS (SELECT cls, CAST(SUM(c_ct) AS BIGINT) AS n_c FROM ct GROUP BY cls),
       |cd AS (SELECT lang AS cls, COUNT(*) AS d_c FROM documents
       |  WHERE doc_id % $nbTrainMod = 0 GROUP BY lang),
       |tt AS (SELECT CAST(SUM(d_c) AS BIGINT) AS d_tot, COUNT(*) AS n_cls FROM cd),
       |vd AS (SELECT COUNT(DISTINCT term) AS v_size FROM ct),
       |dim AS (SELECT cls, n_c, d_c, d_tot, n_cls, v_size
       |  FROM ctot JOIN cd USING (cls) CROSS JOIN tt CROSS JOIN vd),
       |sc AS (SELECT t.doc_id AS doc_id, t.lang AS actual, m.cls AS cls,
       |    CAST(SUM(t.tf * (COALESCE(c.c_ct, 0) + 1)) AS BIGINT) AS num,
       |    CAST(SUM(t.tf) AS BIGINT) AS n,
       |    m.n_c AS n_c, m.d_c AS d_c, m.d_tot AS d_tot, m.n_cls AS n_cls,
       |    m.v_size AS v_size
       |  FROM tf t CROSS JOIN dim m
       |    LEFT JOIN ct c ON c.term = t.term AND c.cls = m.cls
       |  WHERE t.doc_id % $nbTrainMod <> 0
       |  GROUP BY t.doc_id, t.lang, m.cls, m.n_c, m.d_c, m.d_tot, m.n_cls,
       |    m.v_size),
       |scored AS (SELECT doc_id, actual, cls,
       |    (CAST(d_c + 1 AS DOUBLE) / CAST(d_tot + n_cls AS DOUBLE)) *
       |      (CAST(num AS DOUBLE) / CAST(n * (n_c + v_size) AS DOUBLE)) AS score
       |  FROM sc),
       |r AS (SELECT doc_id, actual, cls, score,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cls ASC) AS rn
       |  FROM scored)
       |SELECT doc_id, actual, cls AS predicted, score,
       |  cls = actual AS correct
       |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q107

  private val bsShards = 4
  private val bsGroups = 4

  /** Token-balanced shard assignment — the data-loader bin-packing
    * step: rank documents by token count (descending) and deal them to
    * `bsShards` shards serpentine-wise (0,1,2,3,3,2,1,0,…), so each
    * pass pairs a heavy document in one shard with a lighter one in the
    * next — the deterministic greedy that keeps shard token totals
    * within one document of each other per pass.
    *
    * The rank runs within (lang, grp) — `bsGroups` hash sub-groups —
    * not globally: a single global rank would be an unkeyed window (one
    * partition eats the corpus, the q88 trap); serpentine within each
    * group keeps totals balanced per group, and sums of balanced groups
    * stay balanced. In production grp count scales ∝ corpus / target
    * partition size. Output is the (lang, shard) summary with each
    * shard's token total and its skew vs the lightest shard of the same
    * language. */
  private def q107(s: SparkSession, d: String): DataFrame = {
    val S = bsShards
    val w = Window.partitionBy(col("lang"), col("grp"))
      .orderBy(col("n_tok").desc, col("doc_id").asc)
    val assigned = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast(LongType).as("n_tok"))
      .withColumn("grp",
        strHash(concat(lit("shard:"), col("doc_id").cast(StringType))) % bsGroups)
      .withColumn("rk", row_number().over(w))
      .withColumn("pos", (col("rk") - 1) % S)
      .withColumn("shard",
        when((floor((col("rk") - 1) / S) % 2) === 0, col("pos"))
          .otherwise(lit(S - 1) - col("pos")).cast(IntegerType))
    val summary = assigned.groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val langMin = summary.groupBy(col("lang"))
      .agg(min(col("n_tokens")).as("mn"))
    summary.join(broadcast(langMin), Seq("lang"))
      .withColumn("skew",
        col("n_tokens").cast(DoubleType) / col("mn").cast(DoubleType))
      .select(col("lang"), col("shard"), col("n_docs"), col("n_tokens"),
        col("skew"))
      .orderBy(col("lang"), col("shard"))
  }

  private val q107Sql = {
    val S = bsShards
    val grpHash = sqlStrHash("'shard:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id, lang,
       |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tok,
       |    $grpHash % $bsGroups AS grp
       |  FROM documents),
       |r AS (SELECT doc_id, lang, n_tok, grp,
       |    ROW_NUMBER() OVER (PARTITION BY lang, grp
       |      ORDER BY n_tok DESC, doc_id ASC) AS rk
       |  FROM d),
       |a AS (SELECT lang, n_tok,
       |    CAST(CASE WHEN CAST(FLOOR((rk - 1) / $S) AS BIGINT) % 2 = 0
       |      THEN (rk - 1) % $S ELSE $S - 1 - ((rk - 1) % $S) END AS INT)
       |      AS shard
       |  FROM r),
       |s AS (SELECT lang, shard, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |  FROM a GROUP BY lang, shard),
       |m AS (SELECT lang, CAST(MIN(n_tokens) AS BIGINT) AS mn FROM s GROUP BY lang)
       |SELECT lang, shard, n_docs, n_tokens,
       |  CAST(n_tokens AS DOUBLE) / CAST(mn AS DOUBLE) AS skew
       |FROM s JOIN m USING (lang) ORDER BY lang, shard""".stripMargin
  }

  // --------------------------------------------------------------- q108

  /** Rolling window width (chars) and boundary divisor: a boundary
    * falls after position i when the poly-hash of the trailing `cdcW`
    * chars is ≡ 0 mod `cdcD` — expected chunk length ≈ cdcD chars,
    * content-defined so an insertion early in a document shifts chunk
    * BOUNDARIES only locally (the fixed-offset chunking of q84 would
    * re-key every downstream chunk). */
  private val cdcW = 8
  private val cdcD = 16L

  /** Content-defined chunking + cross-document chunk dedup — the CDC
    * primitive (rsync/LBFS lineage; in LLM curation the robust-to-edit
    * alternative to fixed token chunks for boilerplate detection, cf.
    * q91): chunk boundaries where the rolling window hash hits the
    * divisor, a forced boundary at end-of-document, each chunk
    * fingerprinted by the full-chunk poly-hash, and `n_occ` counting
    * how many chunks corpus-wide share the fingerprint (> 1 ⇒ repeated
    * content).
    *
    * Scale shape: boundary detection is the O(L) rolling-hash kernel
    * [[graft.expressions.CdcBounds]] (one code-point walk per doc,
    * zero shuffle — the oracle's per-window O(L·w) recompute is the
    * engine-portable reference the kernel is proven against, both by
    * the DuckDB gate and by CurationQ5Spec's independent Scala model);
    * chunk emission is a map-side explode; the only shuffle is the
    * chunk_hash-keyed occurrence count, a grain that grows linearly
    * with the corpus. */
  private def q108(s: SparkSession, d: String): DataFrame = {
    val txt = col("text")
    // O(L) rolling-hash kernel (CdcBounds); the O(L·w) per-window
    // recompute it replaces is the spec's independent model
    val bounds = cdcBounds(txt, cdcW, cdcD)
    val ends = array_sort(array_distinct(concat(bounds, array(length(txt)))))
    Tables.documents(s, d)
      .filter(length(txt) > 0)
      .select(col("doc_id"), txt, ends.as("ends"))
      .select(col("doc_id"), txt, col("ends"),
        concat(array(lit(0)), slice(col("ends"), lit(1), size(col("ends")) - 1))
          .as("starts"))
      .select(col("doc_id"), txt,
        posexplode(arrays_zip(col("starts"), col("ends"))))
      .select(col("doc_id"), (col("pos") + 1).as("chunk_idx"),
        col("col.starts").as("start"), col("col.ends").as("end"), txt)
      .withColumn("chunk_len", (col("end") - col("start")).cast(LongType))
      .withColumn("chunk_hash",
        strHash(txt.substr(col("start") + 1, col("end") - col("start"))))
      .select(col("doc_id"), col("chunk_idx"), col("start"), col("chunk_len"),
        col("chunk_hash"))
      .withColumn("n_occ",
        count(lit(1)).over(Window.partitionBy(col("chunk_hash"))))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val q108Sql = {
    val wh = sqlStrHash(s"substring(text, p - ${cdcW - 1}, $cdcW)")
    val ch = sqlStrHash("substring(text, start + 1, endp - start)")
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
       |b0 AS (SELECT doc_id, text,
       |    CASE WHEN length(text) >= $cdcW THEN
       |      list_filter(range($cdcW, length(text) + 1), p -> $wh % $cdcD = 0)
       |    ELSE CAST([] AS BIGINT[]) END AS bl
       |  FROM d),
       |e AS (SELECT doc_id, text,
       |    list_sort(list_distinct(list_append(bl,
       |      CAST(length(text) AS BIGINT)))) AS ends
       |  FROM b0),
       |j AS (SELECT doc_id, text, ends,
       |    CAST(unnest(range(1, len(ends) + 1)) AS INT) AS chunk_idx
       |  FROM e),
       |c AS (SELECT doc_id, chunk_idx,
       |    CASE WHEN chunk_idx = 1 THEN 0 ELSE ends[chunk_idx - 1] END AS start,
       |    ends[chunk_idx] AS endp, text
       |  FROM j),
       |h AS (SELECT doc_id, chunk_idx, start,
       |    CAST(endp - start AS BIGINT) AS chunk_len,
       |    $ch AS chunk_hash
       |  FROM c)
       |SELECT doc_id, chunk_idx, start, chunk_len, chunk_hash,
       |  COUNT(*) OVER (PARTITION BY chunk_hash) AS n_occ
       |FROM h ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // --------------------------------------------------------------- q109

  /** Same reference-slice rule as q96 (every 7th doc trains the LM). */
  private val ccRefMod = 7L

  /** CCNet-style per-language quality terciles: score every non-
    * reference document against the reference LM ([[UnigramLm]] via the
    * q96 recipe), rank WITHIN language, and bucket into head/middle/
    * tail thirds — the CCNet percentile-bucketing step that makes
    * quality thresholds per-language (a global threshold would keep
    * only high-resource languages). Tercile membership is the exact
    * integer comparison rk·3 ≤ n / rk·3 ≤ 2n — no float percentile.
    *
    * Scale shape: q96's exactly (one tf-grain shuffle, broadcast vocab
    * dim), plus a doc-grain lang join, a lang-keyed rank window and a
    * broadcast per-lang count dim. The lang partition grows with the
    * corpus — at fleet scale CCNet derives the two thresholds from a
    * SAMPLE and maps them over the corpus (the same two-pass shape as
    * q82's auto-off-window); the exact-rank form here is the oracle-
    * provable contract that sampled variant is validated against. */
  private def q109(s: SparkSession, d: String): DataFrame = {
    import graft.operators.UnigramLm
    val docs = Tables.documents(s, d)
    val tf = UnigramLm.termFreq(docs, "doc_id", "text")
      .cache() // read twice: LM-count branch + scoring branch (q69 rule)
    val lm = UnigramLm.train(tf.filter(col("doc_id") % ccRefMod === 0))
    val scored =
      UnigramLm.score(tf.filter(col("doc_id") % ccRefMod =!= 0), lm, "doc_id")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("mean_p").desc, col("doc_id").asc)
    val counts = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    scored
      .withColumn("rk", row_number().over(w).cast(LongType))
      .join(broadcast(counts), Seq("lang"))
      .withColumn("bucket",
        when(col("rk") * 3 <= col("n_lang"), lit("head"))
          .when(col("rk") * 3 <= col("n_lang") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"), col("mean_p"), col("rk"),
        col("n_lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  private val q109Sql =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term),
       |ref AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c_t
       |  FROM tf WHERE doc_id % $ccRefMod = 0 GROUP BY term),
       |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS c_total, COUNT(*) AS v_size FROM ref),
       |sc AS (SELECT doc_id,
       |    CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |    CAST(SUM(tf * (COALESCE(c_t, 0) + 1)) AS BIGINT) AS l_num
       |  FROM tf LEFT JOIN ref USING (term)
       |  WHERE doc_id % $ccRefMod <> 0 GROUP BY doc_id),
       |scored AS (SELECT s.doc_id AS doc_id, d.lang AS lang,
       |    CAST(l_num AS DOUBLE) / CAST(n_tokens * (c_total + v_size) AS DOUBLE)
       |      AS mean_p
       |  FROM sc s CROSS JOIN tot JOIN documents d ON d.doc_id = s.doc_id),
       |r AS (SELECT doc_id, lang, mean_p,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY mean_p DESC, doc_id ASC) AS BIGINT) AS rk,
       |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
       |  FROM scored)
       |SELECT doc_id, lang, mean_p, rk, n_lang,
       |  CASE WHEN rk * 3 <= n_lang THEN 'head'
       |       WHEN rk * 3 <= n_lang * 2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM r ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q110

  /** Position packing for the global-first rule (q94's pos_key form);
    * must exceed the max chunks per document (chunks ≤ n_chars). */
  private val cdcPack = 1000000L

  /** Min chunk length for the rewrite path (the LBFS/FastCDC min-size
    * rule, d/4 — see [[graft.operators.ChunkDedup.cdcChunked]]): q108
    * pins the PLAIN kernel contract (every hash hit a boundary); q110
    * gates the operator's default min-size path, whose suppression rule
    * (candidate closer than minLen to its predecessor candidate drops)
    * is mirrored set-wise in the oracle below. */
  private val cdcMin = 4L

  /** CDC-chunk document rewrite — q94's dedup-and-reassemble semantics
    * on content-defined chunks (q108's boundary process + the min-size
    * rule): the globally FIRST occurrence of each chunk fingerprint
    * survives (min pos_key — a partial-aggregatable aggregate,
    * deliberately NOT a chunk_hash window: a billion-document
    * boilerplate chunk would pile one partition), and each document is
    * re-assembled from its surviving chunks in position order. Because
    * the chunks are content-defined, an edit early in a repeated
    * document still leaves every chunk after the next boundary resync
    * identical — so near-identical boilerplate dedupes through this
    * path where q94's fixed token grid would re-key it.
    *
    * Scale shape: chunking is the map-side `cdc_bounds` kernel + an
    * explode; the shuffles are the chunk_hash-keyed min and the
    * doc-keyed reassembly — both corpus-linear grains. */
  private def q110(s: SparkSession, d: String): DataFrame =
    graft.operators.ChunkDedup
      .cdcRewrite(Tables.documents(s, d), "doc_id", "text", cdcW, cdcD,
        cdcMin.toInt)
      .orderBy(col("doc_id"))

  private val q110Sql = {
    val wh = sqlStrHash(s"substring(text, p - ${cdcW - 1}, $cdcW)")
    val ch = sqlStrHash("ctext")
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
       |b0 AS (SELECT doc_id, text,
       |    CASE WHEN length(text) >= $cdcW THEN
       |      list_filter(range($cdcW, length(text) + 1), p -> $wh % $cdcD = 0)
       |    ELSE CAST([] AS BIGINT[]) END AS bl
       |  FROM d),
       |b1 AS (SELECT doc_id, text,
       |    list_transform(
       |      list_filter(range(1, len(bl) + 1),
       |        i -> bl[i] - (CASE WHEN i = 1 THEN 0 ELSE bl[i - 1] END)
       |          >= $cdcMin),
       |      i -> bl[i]) AS blk
       |  FROM b0),
       |e AS (SELECT doc_id, text,
       |    list_sort(list_distinct(list_append(blk,
       |      CAST(length(text) AS BIGINT)))) AS ends
       |  FROM b1),
       |j AS (SELECT doc_id, text, ends,
       |    CAST(unnest(range(1, len(ends) + 1)) AS INT) AS ci
       |  FROM e),
       |c0 AS (SELECT doc_id, ci - 1 AS pos,
       |    CASE WHEN ci = 1 THEN 0 ELSE ends[ci - 1] END AS start,
       |    ends[ci] AS endp, text
       |  FROM j),
       |c AS (SELECT doc_id, pos, start,
       |    substring(text, start + 1, endp - start) AS ctext
       |  FROM c0),
       |h AS (SELECT doc_id, pos, start, ctext, $ch AS chunk_hash,
       |    doc_id * $cdcPack + pos AS pos_key
       |  FROM c),
       |firsts AS (SELECT chunk_hash, MIN(pos_key) AS first_key
       |  FROM h GROUP BY chunk_hash),
       |flag AS (SELECT doc_id, start, ctext, pos_key = first_key AS kept
       |  FROM h JOIN firsts USING (chunk_hash))
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  COALESCE(string_agg(CASE WHEN kept THEN ctext END, '' ORDER BY start), '')
       |    AS cleaned
       |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("q105_dsir_sample", q105, Some(q105Sql), Seq("A16", "A17", "W5")),
    GQuery("q106_nb_classifier", q106, Some(q106Sql), Seq("F10", "A16", "J6")),
    GQuery("q107_balanced_shards", q107, Some(q107Sql), Seq("W5", "A17", "O1")),
    GQuery("q108_cdc_chunks", q108, Some(q108Sql), Seq("A16", "C12", "W1")),
    GQuery("q109_ccnet_buckets", q109, Some(q109Sql), Seq("F6", "W5", "A16")),
    GQuery("q110_cdc_rewrite", q110, Some(q110Sql), Seq("A16", "C12", "J7")))
}
