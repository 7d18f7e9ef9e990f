package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Reference-corpus unigram language model for quality filtering — the
  * CCNet recipe's shape (train a small LM on a high-quality reference
  * corpus, score candidate documents against it, drop the tail), with
  * the scoring kept in the engine's ln-free rational discipline so the
  * verdict is bitwise portable across engines: mean smoothed token
  * probability instead of log-perplexity — exact integer arithmetic up
  * to ONE final IEEE division, monotone in the add-1-smoothed document
  * likelihood^(1/n) ranking the perplexity filter thresholds.
  *
  * Scale shape: the corpus is shuffled once, at the (doc, term) tf
  * grain (a key that grows with the corpus — never low-cardinality);
  * the trained model is a vocabulary-sized derived dimension and
  * BROADCASTS into the scoring join; scoring itself is a doc-grain
  * aggregate. Overflow headroom: c_t ≤ reference tokens (~10¹³ at
  * 100 TB) × per-doc tf (~10⁴) stays under 2⁶³.
  *
  * Registry face: q96 (`queries/CurationQ4.scala`), oracle-paired.
  */
object UnigramLm {

  /** (id, term, tf) term frequencies — the one corpus-grain shuffle.
    * Callers that read the result twice (train on one slice, score
    * another — the q96 shape) should `.cache()` it: without the cache
    * Catalyst plans two full tokenize+aggregate chains over the corpus
    * (the q69 contract). */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumnRenamed("__id", idCol)

  /** Train on a reference tf slice: (term, c_t) counts — the model is
    * vocabulary-sized, orders of magnitude smaller than the corpus. */
  def train(refTf: DataFrame): DataFrame =
    refTf.groupBy(col("term")).agg(sum(col("tf")).as("c_t"))

  /** Merge two trained models — term counts are a MONOID, so daily LM
    * maintenance is an exact union-sum over the vocabulary dimension:
    * `merge(train(A), train(B)) ≡ train(A ∪ B)` row-for-row (integer
    * addition, no approximation — UnigramLmSpec). The incremental-
    * curation counterpart for the LM: a daily driver re-trains on the
    * delta only and merges, never re-reading old reference text. Both
    * inputs are vocabulary-sized; the merge is one vocab-grain
    * aggregation. */
  def merge(lmA: DataFrame, lmB: DataFrame): DataFrame =
    lmA.unionByName(lmB)
      .groupBy(col("term")).agg(sum(col("c_t")).as("c_t"))

  /** Score a tf relation against a trained model: per document, the
    * mean add-1-smoothed token probability p(t) = (c_t + 1)/(C + V)
    * (c_t = 0 for OOV), the OOV fraction, and a `keep` verdict that
    * drops documents where OOV tokens are the majority (an exact
    * integer comparison — no float boundary). */
  def score(tf: DataFrame, lm: DataFrame, idCol: String): DataFrame = {
    val tot = lm.agg(sum(col("c_t")).as("c_total"), count(lit(1)).as("v_size"))
    tf.join(broadcast(lm), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * (coalesce(col("c_t"), lit(0L)) + lit(1L))).as("l_num"),
        sum(when(col("c_t").isNull, col("tf")).otherwise(lit(0L))).as("n_oov"))
      .crossJoin(broadcast(tot))
      .withColumn("mean_p", col("l_num").cast(DoubleType) /
        (col("n_tokens") * (col("c_total") + col("v_size"))).cast(DoubleType))
      .withColumn("oov_frac",
        col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("keep", col("n_oov") * lit(2L) <= col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("n_oov"), col("mean_p"),
        col("oov_frac"), col("keep"))
  }
}
