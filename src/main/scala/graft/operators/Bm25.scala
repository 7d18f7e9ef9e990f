package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring for curation workloads (hard-negative
  * mining, seed-document expansion, benchmark-neighbourhood audits):
  * BM25 over a whitespace token model, kept in the engine's ln-free
  * fixed-point discipline so scores are bitwise portable across
  * engines. Reference provenance: the reference's catalog searches are
  * exact filters (`LTA/lta-query.py:32-76`); ranked retrieval is part
  * of the beyond-reference LLM-curation surface.
  *
  * Formula (k1 = 1, b = 3/4, both pinned):
  *
  *   idf(t)  = (N - df + 1/2)/(df + 1/2)          — the ln-free rational
  *             idf; same sign/ordering as the textbook log form, exact
  *             as the integer ratio (2N - 2df + 1)/(2df + 1)
  *   sat(t,d)= tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))
  *           = 8·tf·avgdl / (4·tf·avgdl + avgdl + 3·dl)
  *
  * and every division is an INTEGER floor division at scale
  * [[Bm25.Scale]] (`div` here, `//` in the DuckDB oracle) — integer
  * ops are exact on every engine, so the per-term scores and their
  * per-document SUM are order-free integers; only the caller's final
  * display division produces an IEEE double.
  *
  * Overflow headroom at 100 TB (N ~ 10¹⁰ docs, tf/dl ~ 10⁴,
  * avgdl_s = avgdl·10⁴ ~ 10⁸): the saturation numerator
  * 8·tf·avgdl_s·S ≤ 8·10⁴·10⁸·10⁴ = 8·10¹⁶ and the idf product
  * (2N)·(2S) ≤ 4·10¹⁴ both sit well under 2⁶³.
  *
  * Scale shape: the corpus contributes its one (doc,term) tf shuffle
  * (shared with everything else that reads tf — the q69 rule); the
  * document-frequency table is vocabulary-sized; the QUERY side is a
  * workload-sized relation that broadcasts, so candidate generation is
  * a broadcast probe of tf — no corpus-keyed shuffle with the query
  * cardinality in its key. The only added exchange is re-keying the
  * candidate set (output-sized, ∝ Σ_t df(t) over query terms) by doc
  * to pick up document length.
  */
object Bm25 {
  /** Fixed-point scale for avgdl, saturation and scores. */
  val Scale = 10000L

  /** Per-query rarest-term pruning depth (see [[queryTerms]]). */
  val TermsPerQuery = 8

  import graft.functions.IntOps.idiv

  /** Production default for [[queryTerms]]' df prune: drop terms
    * matching over 10% (100‰) of the corpus. */
  val DefaultMaxDfPermille = 100L

  /** Select the retrieval terms for each query document: the
    * [[TermsPerQuery]] rarest corpus terms (df ascending, term
    * ascending as the deterministic tie-break), dropping terms matching
    * more than `maxDfPermille`‰ of the corpus. Rarest-first is the
    * classic candidate-bounding move: the candidate set is ∝ Σ df over
    * chosen terms, so stopword-df terms would make every query scan the
    * whole corpus; the df prune is the hard cap behind it (at the
    * default 100‰ no query can touch more than TermsPerQuery·N/10
    * candidate rows). The rank window is keyed by query —
    * workload-bounded.
    *
    * `qdocs` is (q_id, term) distinct; `dfreq` is the vocabulary-sized
    * (term, df) dimension; `nDocs` a 1-row (n_docs) relation. */
  def queryTerms(qdocs: DataFrame, dfreq: DataFrame, nDocs: DataFrame,
                 maxDfPermille: Long = DefaultMaxDfPermille): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("df").asc, col("term").asc)
    qdocs.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 1000L <= col("n_docs") * maxDfPermille)
      .withColumn("trk", row_number().over(w))
      .filter(col("trk") <= TermsPerQuery)
      .select(col("q_id"), col("term"), col("df"))
  }

  /** Corpus statistics for the saturation term: a 1-row (n_docs,
    * t_total, avgdl_s) relation derived from a tf relation. Public so a
    * STREAMING scorer can pin the stats of the indexed corpus snapshot
    * while scoring arriving documents against it. */
  def stats(tf: DataFrame): DataFrame =
    statsFromDl(tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))

  /** [[stats]] as ONE direct aggregation of the tf relation — no
    * doc-grain intermediate: n_docs = COUNT(DISTINCT doc_id) and
    * t_total = SUM(tf) are integer-exact equal to counting/summing the
    * per-doc dl rows (a sum of per-doc sums is the total sum), so the
    * stats row is bitwise the [[stats]] row without materializing dl.
    * The form for builds whose postings derive dl via a window (round
    * 13): nothing doc-grain needs to exist at all. */
  def statsFromTf(tf: DataFrame): DataFrame =
    tf
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        coalesce(sum(col("tf")), lit(0L)).as("t_total"))
      .withColumn("avgdl_s",
        when(col("n_docs") > 0L, idiv(col("t_total") * Scale, col("n_docs")))
          .otherwise(lit(0L)))

  /** [[stats]] over an ALREADY-AGGREGATED (doc_id, dl) relation — the
    * form an index build uses so the doc-grain aggregation it computes
    * for the postings join is not re-run for the stats row. */
  def statsFromDl(dl: DataFrame): DataFrame =
    dl
      // coalesce: a sum over zero rows is NULL — an EMPTY tf relation
      // (an index built before any documents arrive) must yield the
      // zero-corpus stats row, not nulls that NPE a later merge
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("t_total"))
      .withColumn("avgdl_s",
        when(col("n_docs") > 0L, idiv(col("t_total") * Scale, col("n_docs")))
          .otherwise(lit(0L)))

  /** Score every (query, document) candidate pair: documents sharing at
    * least one retrieval term with the query, scored by the fixed-point
    * BM25 sum over matched terms. `tf` is the corpus (doc_id, term, tf)
    * relation — CACHE it in callers that also derive `dfreq` from it;
    * `qterms` is [[queryTerms]] output (broadcast-sized).
    *
    * Returns (q_id, doc_id, n_hit, bm25_s) with `bm25_s` the integer
    * score at scale [[Scale]]. */
  def scorePairs(tf: DataFrame, qterms: DataFrame): DataFrame =
    scorePairs(tf, qterms, stats(tf))

  /** [[scorePairs]] with pinned corpus statistics (the streaming-parity
    * form: batch and stream must saturate against the same snapshot). */
  def scorePairs(tf: DataFrame, qterms: DataFrame, st: DataFrame): DataFrame =
    scorePairs(tf, qterms,
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")), st)

  /** [[scorePairs]] with BOTH corpus-derived inputs precomputed — the
    * form for callers that already hold the doc-length relation (and
    * typically derived `st` from it via [[statsFromDl]]): without it a
    * retrieval query aggregates the corpus to doc grain three separate
    * times (dl for the join, dl again inside [[stats]], and a
    * COUNT(DISTINCT doc_id) for the df prune) — three corpus-grain
    * shuffles where one suffices (round 13, guide §2.2). */
  def scorePairs(tf: DataFrame, qterms: DataFrame, dl: DataFrame,
                 st: DataFrame): DataFrame =
    tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(st))
      .withColumn("sc", scoreExpr(col("tf"), col("dl"), col("df"),
        col("n_docs"), col("avgdl_s")))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("sc")).as("bm25_s"))

  /** The per-term fixed-point score as Column algebra — the ONE
    * definition of the arithmetic, shared by [[scorePairs]], the
    * streaming gate, and the persisted-index search so they cannot
    * drift. */
  def scoreExpr(tf: org.apache.spark.sql.Column, dl: org.apache.spark.sql.Column,
                df: org.apache.spark.sql.Column, nDocs: org.apache.spark.sql.Column,
                avgdlS: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val satNum = lit(8L) * tf * avgdlS * Scale
    val satDen = lit(4L) * tf * avgdlS + avgdlS + lit(3L) * dl * Scale
    val idfNum = lit(2L) * nDocs - lit(2L) * df + lit(1L)
    idiv(idfNum * idiv(satNum, satDen), lit(2L) * df + lit(1L))
  }

  /** DuckDB fragments mirroring the fixed-point arithmetic: the
    * saturation and idf steps with `//` floor division. Operand names
    * are column references in the caller's CTE. */
  def sqlSat(tf: String, dl: String, avgdlS: String): String =
    s"(8 * $tf * $avgdlS * $Scale) // (4 * $tf * $avgdlS + $avgdlS + 3 * $dl * $Scale)"
  def sqlScore(tf: String, dl: String, avgdlS: String, df: String, nDocs: String): String =
    s"((2 * $nDocs - 2 * $df + 1) * (${sqlSat(tf, dl, avgdlS)})) // (2 * $df + 1)"
}
