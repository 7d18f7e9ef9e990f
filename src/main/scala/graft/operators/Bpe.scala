package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Byte-pair-encoding vocabulary induction over a corpus — the tokenizer-
  * training half of a training-data pipeline (the reference's text surface
  * stops at whitespace tokens, `LTA/lta-retrieve.py:422`; an LLM corpus
  * owner also needs to TRAIN the subword vocabulary on the corpus).
  *
  * Scale shape: the corpus is touched exactly once (the word-frequency
  * aggregation, a partial-aggregatable count keyed on the word). Every
  * merge round after that runs over the VOCABULARY table — bounded by
  * distinct words, orders of magnitude smaller than a 100 TB corpus and
  * sublinear in it — as map-side symbol-pair explodes plus a pair-grain
  * count. Merge selection is inherently sequential (round r+1's counts
  * depend on round r's merge), so each round ends in ONE bounded driver
  * action: a TakeOrdered(1) argmax — the same driver-side footprint as
  * Scheduler's sanctioned greedy placement, not a corpus collect.
  */
object Bpe {

  /** Corpus → (w, freq) word-frequency table with the initial
    * character-grain symbol column (`syms`). One full-corpus pass. */
  def initVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", filter(split(col("w"), ""), s => length(s) > 0))

  /** Adjacent-symbol-pair counts weighted by word frequency — one BPE
    * statistics round. Map-side explode over the vocab table; the only
    * shuffle is the (lft, rgt)-grain count. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), col("syms"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
      .select(element_at(col("syms"), col("i")).as("lft"),
        element_at(col("syms"), col("i") + 1).as("rgt"), col("freq"))
      .groupBy(col("lft"), col("rgt"))
      .agg(sum(col("freq")).as("cnt"))

  /** Apply one merge (lft, rgt) → lft+rgt to a symbol array, left to
    * right without re-merging the freshly produced token in the same
    * pass (BPE's standard single-merge semantics: "aaaa" with (a,a)
    * becomes [aa, aa], "aaa" becomes [aa, a]).
    *
    * Pure Column algebra over the `aggregate` higher-order function —
    * codegen'd, zero shuffle: the accumulator carries (out, pending) and
    * the finish lambda flushes the pending symbol. */
  def applyMerge(syms: Column, lft: String, rgt: String): Column = {
    val nullStr = lit(null).cast(StringType)
    val init = struct(
      array().cast("array<string>").as("out"), nullStr.as("carry"))
    aggregate(
      syms,
      init,
      (acc, s) =>
        when(acc.getField("carry") === lft && s === rgt,
          struct(concat(acc.getField("out"), array(lit(lft + rgt))).as("out"),
            nullStr.as("carry")))
          .otherwise(struct(
            when(acc.getField("carry").isNull, acc.getField("out"))
              .otherwise(concat(acc.getField("out"), array(acc.getField("carry"))))
              .as("out"),
            s.as("carry"))),
      acc =>
        when(acc.getField("carry").isNull, acc.getField("out"))
          .otherwise(concat(acc.getField("out"), array(acc.getField("carry")))))
  }

  /** One learned merge: the pair, its count at selection time, and the
    * round it was learned in (1-based). */
  final case class Merge(lft: String, rgt: String, cnt: Long, round: Int)

  /** Train `rounds` BPE merges on a corpus. Deterministic: each round
    * picks the (count DESC, lft ASC, rgt ASC) argmax — the tie-break
    * makes the merge sequence engine-portable. Stops early when no pair
    * reaches `minCount`.
    *
    * The vocab lineage is truncated per round (`localCheckpoint`): the
    * table is vocabulary-sized, and without truncation round r's plan
    * would re-execute all r−1 merge folds on every subsequent action. */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            minCount: Long = 2L): (Seq[Merge], DataFrame) = {
    require(rounds >= 0, s"need rounds >= 0; got $rounds")
    var vocab = initVocab(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      // bounded driver action: TakeOrdered(1) over the pair-grain counts
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("lft").asc, col("rgt").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minCount) done = true
      else {
        val (l, g, c) = (top.head.getAs[String]("lft"),
          top.head.getAs[String]("rgt"), top.head.getAs[Long]("cnt"))
        merges += Merge(l, g, c, r)
        val prev = vocab
        vocab = vocab.withColumn("syms", applyMerge(col("syms"), l, g))
          .localCheckpoint()
        prev.unpersist()
        r += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Tokenize with a learned merge sequence: the merges REPLAY in
    * training order over each word's character sequence — the standard
    * BPE encode. Map-side only (a chain of `aggregate` folds). */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val base = docs
      .withColumn("w", explode(graft.functions.TextFunctions.tokens(col(textCol))))
      .withColumn("syms", filter(split(col("w"), ""), s => length(s) > 0))
    merges.foldLeft(base)((d, m) =>
      d.withColumn("syms", applyMerge(col("syms"), m.lft, m.rgt)))
  }
}
