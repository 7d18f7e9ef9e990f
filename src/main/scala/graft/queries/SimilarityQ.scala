package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFunctions._
import QueryDsl._

/** Fuzzy-dedup + similarity-search operators for the training-data
  * pipeline: MinHash signatures, LSH banding with exact-Jaccard
  * verification, SimHash, embedding cosine top-k, blocked near-dup pairs.
  *
  * Scale design: signatures are per-row map work; candidate generation
  * joins on (band, bucket) so the shuffle is bounded by bucket
  * collisions, never all-pairs; verification runs only on candidates.
  * Brute-force cosine is restricted to a bounded probe set — at fleet
  * scale the same plan shape holds with an IVF/LSH bucket column.
  */
object SimilarityQ {

  private val P = HashMod

  /** Per-document MinHash signature, K=8 permutations: min over
    * (a_k·h(token)+b_k) mod p per k. Computed MAP-SIDE as K array folds
    * over the distinct-token hashes, then posexploded to the (doc_id, k)
    * grain — no shuffle at all (the oracle SQL defines the same
    * semantics in the row-exploded groupBy form). */
  private def q31(s: SparkSession, d: String): DataFrame = {
    val toks = array_distinct(transform(array_distinct(tokens(col("text"))), strHash(_)))
    def mhOf(k: Int): Column = array_min(transform(col("toks"),
      t => (lit(MinhashA(k)) * t + lit(MinhashB(k))) % P))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        posexplode(array((0 until MinhashK).map(mhOf): _*)).as(Seq("k", "minhash")))
      .orderBy(col("doc_id"), col("k"))
  }

  private val q31Sql = {
    val a = MinhashA.mkString("[", ", ", "]")
    val b = MinhashB.mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(${sqlTokens("text")})) AS tok FROM documents),
       |hashed AS (SELECT doc_id, ${sqlStrHash("tok")} AS th FROM toks),
       |ks AS (SELECT unnest(range(0, $MinhashK)) AS k)
       |SELECT doc_id, CAST(k AS INT) AS k,
       |  MIN(($a[CAST(k AS INT) + 1] * th + $b[CAST(k AS INT) + 1]) % $P) AS minhash
       |FROM hashed CROSS JOIN ks GROUP BY doc_id, k ORDER BY doc_id, k""".stripMargin
  }

  /** MinHash-LSH near-dup pipeline: band the K=24 signature into 3 bands
    * of 8 rows, bucket-join candidate pairs, verify with exact token-set
    * Jaccard, keep pairs ≥ 0.5. 8-row bands are the corpus-size scaling
    * fix (the q78 move applied to MinHash): a band collides with
    * probability J⁸ instead of the legacy 2×4 scheme's J⁴, so
    * moderately-similar doc clusters — the population that grows
    * quadratically with the corpus — stop flooding the candidate join,
    * while the third band keeps recall at high J comparable. The narrow
    * 2×4 scheme stays available (bands/rows parameters) as the
    * spec-pinned legacy contract.
    *
    * Shuffle budget: ONE shuffle builds the signature (token explode →
    * groupBy), ONE dedups candidate pairs; everything else is broadcast.
    * The per-doc token dim (one fixed-width hashed array per doc) is
    * broadcast into both the candidate join and the verify stage, so the
    * near-quadratic pair set never moves through a shuffle carrying
    * arrays. The size-ratio prune (jaccard ≤ min/max ⇒ pairs with
    * min·2 < max can never reach 0.5) runs INSIDE the candidate join,
    * before the distinct, cutting the pair shuffle itself. At fleet scale
    * the broadcast dim becomes a bucketed co-located join on doc_id —
    * same plan shape, still no array shuffle on pairs.
    * .cache() on the signature is a materialization barrier: without it
    * CollapseProject re-evaluates the tokenize+hash chain per pair. */
  private def q32(s: SparkSession, d: String): DataFrame =
    lshNearDupPairs(s, d, hinted = false)

  /** `hinted = false` (the registered default) leaves the join strategy
    * to Catalyst: below the broadcast threshold the dims broadcast —
    * PlanContractSpec asserts that at small SF — and past it the plan
    * degrades to the co-located shuffle join instead of an
    * over-the-ceiling broadcast, which is exactly the 100 TB behavior
    * (measured: unhinted is also no slower at sf0.1/sf1eq — the forced
    * broadcast's serial build cost was q32's residual growth term).
    * `hinted = true` forces the broadcasts; kept as the explicit
    * contract form and proven result-identical by PlanContractSpec. */
  private[queries] def lshNearDupPairs(s: SparkSession, d: String,
                                       hinted: Boolean): DataFrame =
    lshNearDupPairsFrom(Tables.documents(s, d), hinted)

  /** One row per doc: sorted distinct hashed token array + its size —
    * the shared signature base of the batch LSH pipeline AND the
    * streaming dedup-on-ingest path (both engines hash identically, so
    * intersection/union counts are unchanged by hashing; sorted ONCE so
    * verification merge-counts with `sorted_intersect_count`). */
  private[graft] def hashedTokenSets(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"),
        array_sort(array_distinct(transform(array_distinct(tokens(col("text"))), strHash(_))))
          .as("toks"))
      .withColumn("n", size(col("toks")).cast(LongType))

  /** MinHash k over a MATERIALIZED `toks` attribute — map-side array
    * fold, no explode, no shuffle. */
  private def mh(k: Int): Column = array_min(transform(col("toks"),
    t => (lit(MinhashA(k)) * t + lit(MinhashB(k))) % P))

  /** Deterministic band key: base-31 fold over the band's `rows`
    * minhashes (mod-P after every step but the last — the historical
    * 4-row fold's exact shape, generalized). */
  private def bucket(b: Int, rows: Int): Column = {
    val ks = (rows * b until rows * b + rows).map(mh)
    ks.tail.zipWithIndex.foldLeft(ks.head) { case (acc, (k, i)) =>
      val step = acc * 31L + k % P
      if (i < rows - 2) step % P else step
    }
  }

  /** The DuckDB spelling of the same fold, over `MAX(CASE WHEN k % rows
    * = i …)` pivot terms — one generator for every oracle that replicates
    * the banding (q32 here, q79/q89 in CurationQ). */
  private[queries] def sqlBandFold(rows: Int): String = {
    def t(i: Int) = s"MAX(CASE WHEN k % $rows = $i THEN minhash END)"
    (1 until rows).foldLeft(t(0)) { (acc, i) =>
      val step = s"$acc * 31 + ${t(i)} % $P"
      if (i < rows - 1) s"($step) % $P" else s"($step)"
    }
  }

  private[graft] val numBands = MinhashBands

  /** Full band→bucket signature vector over a materialized `toks`
    * attribute (wide banding by default). Carrying the vector on every
    * row is what lets candidate joins emit a pair only in its FIRST
    * matching band — replacing a distinct() over the near-quadratic raw
    * candidate set (batch q32) and replacing stateful dedup entirely in
    * the streaming path. */
  private[graft] def bucketVector: Column = bucketVectorOf(numBands, MinhashBandRows)

  private[graft] def bucketVectorOf(bands: Int, rows: Int): Column =
    array((0 until bands).map(bucket(_, rows)): _*)

  /** "No earlier band matched" predicate between two signature vectors,
    * spelled with element_at so the whole join condition stays inside
    * whole-stage codegen. */
  private[graft] def earlierBandMatch(xBuckets: Column, xBand: Column,
                                      yBuckets: Column,
                                      bands: Int = numBands): Column =
    (0 until bands - 1).map(b =>
      xBand > b && element_at(xBuckets, b + 1) === element_at(yBuckets, b + 1))
      .reduce(_ || _)

  /** DataFrame-input form of the q32 pipeline (input: doc_id, text) —
    * the near-dup stage of `pipelines.Curation` runs over an already
    * filtered corpus, not a table path. `threshold` drives BOTH the
    * in-join size-ratio prune (jaccard ≤ min/max, so min/max < t can
    * never reach t; spelled as the same rounded division the verify
    * filter uses, so the two never disagree at the float boundary) and
    * the verification filter, so every consumer judges pairs at one
    * threshold. */
  private[graft] def lshNearDupPairsFrom(corpus: DataFrame,
                                         hinted: Boolean,
                                         threshold: Double = 0.5): DataFrame =
    lshNearDupPairsScoped(corpus, hinted, threshold)._1
      .orderBy(col("doc_a"), col("doc_b"))

  /** [[lshNearDupPairsFrom]] minus the output sort (pair consumers that
    * treat the result as an edge set don't pay a shuffle for ordering),
    * plus a cleanup thunk releasing the two per-invocation caches (token
    * dim + banded signatures). Callers that materialize the pair set —
    * the daily incremental driver above all — invoke the thunk so
    * repeated runs don't accumulate executor storage; registry queries
    * use the sorted form and let the harness's clearCache() reap. */
  private[graft] def lshNearDupPairsScoped(corpus: DataFrame,
                                           hinted: Boolean,
                                           threshold: Double = 0.5,
                                           bands: Int = numBands,
                                           rows: Int = MinhashBandRows): (DataFrame, () => Unit) =
    lshNearDupPairsFromSets(hashedTokenSets(corpus), hinted, threshold,
      bands, rows)

  /** [[lshNearDupPairsScoped]] over PRECOMPUTED token sets (doc_id,
    * toks, n — [[hashedTokenSets]]'s shape): the curation pipeline's
    * scoring stage already tokenized every candidate, so re-deriving
    * the sets from text here was one full tokenize+hash pass per
    * curation query (round 14, VERDICT #3). */
  private[graft] def lshNearDupPairsFromSets(sets: DataFrame,
                                             hinted: Boolean,
                                             threshold: Double = 0.5,
                                             bands: Int = numBands,
                                             rows: Int = MinhashBandRows): (DataFrame, () => Unit) = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]; got $threshold")
    require(bands * rows <= MinhashWideK, s"banding $bands×$rows exceeds $MinhashWideK hashes")
    def maybe(df: DataFrame): DataFrame = if (hinted) broadcast(df) else df
    val docs = sets.select(col("doc_id"), col("toks"), col("n")).cache()
    // repartition: the docs scan is few partitions (small file), but this
    // row set is the probe side of the pair-generating join — the whole
    // candidate+verify codegen stage inherits ITS parallelism. 10k rows
    // shuffled so millions of pairs fan out across all cores.
    val sigv = docs
      .select(col("doc_id"), col("n"), bucketVectorOf(bands, rows).as("buckets"))
      .select(col("doc_id"), col("n"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      // explicit N: AQE would coalesce a 10k-row shuffle to one partition
      // (small-input heuristic), but downstream fan-out is quadratic in
      // bucket size — the classic case where input bytes mispredict stage
      // cost. Pin to the core count.
      .repartition(32, col("doc_id"))
      .cache()
    val earlierMatch =
      earlierBandMatch(col("x.buckets"), col("x.band"), col("y.buckets"), bands)
    // spelled as a DIVISION so the prune rounds exactly like the final
    // `jaccard >= threshold` comparison: `min >= t·max` can drop a true
    // boundary pair when t·max rounds up (t=0.4, n=2 vs 5 → 2.0000…4 > 2)
    val sizePrune = least(col("x.n"), col("y.n")).cast(DoubleType) /
      greatest(col("x.n"), col("y.n")).cast(DoubleType) >= lit(threshold)
    val cand = sigv.as("x").join(maybe(sigv.as("y")),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id") && sizePrune && !earlierMatch)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    // n_union = na + nb − n_inter avoids materializing the union array.
    // The monotonically_increasing_id column (dropped before output) is a
    // predicate-pushdown fence: without it Catalyst rewrites the jaccard
    // filter into the join condition, evaluating the intersect kernel
    // TWICE per pair (once as join residual, once for the projected
    // n_inter). The fence keeps it at one evaluation per pair.
    val verified = cand
      .join(maybe(docs.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
        col("n").as("na"))), "doc_a")
      .join(maybe(docs.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
        col("n").as("nb"))), "doc_b")
      .withColumn("pushdown_fence", monotonically_increasing_id())
      .withColumn("n_inter",
        call_function("sorted_intersect_count", col("toks_a"), col("toks_b")).cast(LongType))
      .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      .withColumn("jaccard", col("n_inter").cast(DoubleType) / col("n_union").cast(DoubleType))
      .filter(col("jaccard") >= threshold)
    val out = verified.select(col("doc_a"), col("doc_b"), col("n_inter"),
      col("n_union"), col("jaccard"))
    (out, () => { docs.unpersist(); sigv.unpersist(); () })
  }

  private val q32Sql = {
    val a = MinhashA.mkString("[", ", ", "]")
    val b = MinhashB.mkString("[", ", ", "]")
    val r = MinhashBandRows
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(${sqlTokens("text")})) AS tok FROM documents),
       |hashed AS (SELECT doc_id, ${sqlStrHash("tok")} AS th FROM toks),
       |ks AS (SELECT unnest(range(0, $MinhashWideK)) AS k),
       |sig AS (SELECT doc_id, CAST(k AS INT) AS k,
       |    MIN(($a[CAST(k AS INT) + 1] * th + $b[CAST(k AS INT) + 1]) % $P) AS minhash
       |  FROM hashed CROSS JOIN ks GROUP BY doc_id, k),
       |bands AS (SELECT doc_id, k // $r AS band,
       |    ${sqlBandFold(r)} AS bucket
       |  FROM sig GROUP BY doc_id, k // $r),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |sets AS (SELECT doc_id, list_distinct(list_transform(
       |    list_distinct(${sqlTokens("text")}), t -> ${sqlStrHash("t")})) AS toks
       |  FROM documents),
       |pairs AS (SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT) AS n_inter,
       |    CAST(len(sa.toks) AS BIGINT) AS na, CAST(len(sb.toks) AS BIGINT) AS nb
       |  FROM cand JOIN sets sa ON cand.doc_a = sa.doc_id
       |            JOIN sets sb ON cand.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, n_inter,
       |  na + nb - n_inter AS n_union,
       |  CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE) AS jaccard
       |FROM pairs
       |WHERE CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** SimHash (32-bit): signed bit votes from distinct token hashes —
    * one map-side pass per row via the native simhash32 kernel (spec-
    * verified bit-identical to the exploded ±1-vote aggregation, which
    * is the form the oracle SQL spells out). */
  private def q33(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        call_function("simhash32",
          transform(array_distinct(tokens(col("text"))), strHash(_))).as("simhash"))
      .orderBy(col("doc_id"))

  private val q33Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(${sqlTokens("text")})) AS tok FROM documents),
       |hashed AS (SELECT doc_id, ${sqlStrHash("tok")} AS th FROM toks),
       |bits AS (SELECT unnest(range(0, 32)) AS j),
       |votes AS (SELECT doc_id, j,
       |    SUM(CASE WHEN (th >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hashed CROSS JOIN bits GROUP BY doc_id, j)
       |SELECT doc_id,
       |  CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) ELSE 0 END * CAST(pow(2.0, j) AS BIGINT)) AS BIGINT) AS simhash
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Dot product: native codegen expression accumulating left-to-right —
    * bitwise identical to a sequential fold on any engine (see
    * `graft.expressions.FloatDot`), ~10× the interpreted HOF form. */
  private[queries] def dotFold(a: Column, b: Column): Column =
    call_function("float_dot", a, b)

  private[queries] def sqlDotFold(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  /** Brute-force cosine top-k: 8 probe vectors against the full corpus —
    * the exact baseline an ANN index is validated against. */
  private def q34(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("norm", sqrt(dotFold(col("embedding"), col("embedding"))))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val scored = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dotFold(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  private val q34Sql =
    s"""WITH emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |probes AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm FROM emb WHERE vec_id < 8),
       |scored AS (SELECT q_id, vec_id,
       |    ${sqlDotFold("embedding", "q_emb")} / (norm * q_norm) AS cos
       |  FROM emb CROSS JOIN probes WHERE vec_id <> q_id),
       |ranked AS (SELECT q_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin

  /** Blocked near-dup over embeddings: label column as the blocking key
    * (the plan shape of an IVF/LSH bucket join), cosine ≥ 0.9 pairs. */
  private def q35(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .filter(col("vec_id") < 2000)
      .withColumn("norm", sqrt(dotFold(col("embedding"), col("embedding"))))
    val x = emb.select(col("label"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val y = emb.select(col("label"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("norm").as("norm_b"))
    x.join(y, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotFold(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cos") >= 0.4)
      .select(col("label"), col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("label"), col("id_a"), col("id_b"))
  }

  private val q35Sql =
    s"""WITH emb AS (SELECT label, vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS norm
       |  FROM embeddings WHERE vec_id < 2000)
       |SELECT x.label AS label, x.vec_id AS id_a, y.vec_id AS id_b,
       |  ${sqlDotFold("x.embedding", "y.embedding")} / (x.norm * y.norm) AS cos
       |FROM emb x JOIN emb y ON x.label = y.label AND x.vec_id < y.vec_id
       |WHERE ${sqlDotFold("x.embedding", "y.embedding")} / (x.norm * y.norm) >= 0.4
       |ORDER BY label, id_a, id_b""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q31_minhash_signature", q31, Some(q31Sql), Seq("A16")),
    GQuery("q32_lsh_neardup_pairs", q32, Some(q32Sql), Seq("A16", "J7")),
    GQuery("q33_simhash", q33, Some(q33Sql), Seq("A16")),
    GQuery("q34_cosine_topk", q34, Some(q34Sql), Seq("O1", "O4")),
    GQuery("q35_blocked_neardup", q35, Some(q35Sql), Seq("A16", "J7")))
}
