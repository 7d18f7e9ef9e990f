package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language model counts as a first-class operator — the
  * trainable/mergeable half of q112's interpolated scorer, one model
  * order above [[UnigramLm]].
  *
  * Both count tables are MONOIDS (integer sums keyed by the n-gram), so
  * daily LM maintenance is exact: `merge(train(A), train(B)) ≡
  * train(A ∪ B)` row-for-row — a delta re-trains on the day's reference
  * documents only and merges, never re-reading old reference text
  * (BigramLmSpec; the [[UnigramLm.merge]] discipline one order up).
  *
  * Scale shape: [[bigrams]] is a map-side positional explode (no
  * shuffle); [[train]] is one (pv, cr)-keyed aggregation whose output
  * is bigram-vocabulary-sized; [[merge]] aggregates two
  * vocabulary-sized tables. The scoring join's broadcast ceiling and
  * its bucketed fallback are documented on q112.
  */
object BigramLm {

  /** (id, pv, cr) bigram OCCURRENCES of each document — map-side
    * positional explode over the token array; documents with fewer than
    * two tokens contribute nothing. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = graft.functions.TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol).as("__id"), tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("__id"),
        explode(transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("pv"),
            element_at(col("tk"), i + 1).as("cr")))).as("bg"))
      .select(col("__id").as(idCol), col("bg.pv").as("pv"), col("bg.cr").as("cr"))
  }

  /** Train on a reference occurrence relation: (pv, cr, c2) counts —
    * bigram-vocabulary-sized. */
  def train(occ: DataFrame): DataFrame =
    occ.groupBy(col("pv"), col("cr")).agg(count(lit(1)).as("c2"))

  /** Merge two trained models — exact union-sum over the bigram
    * vocabulary (integer addition, no approximation). */
  def merge(lmA: DataFrame, lmB: DataFrame): DataFrame =
    lmA.unionByName(lmB)
      .groupBy(col("pv"), col("cr")).agg(sum(col("c2")).as("c2"))
}
