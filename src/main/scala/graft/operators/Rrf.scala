package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.IntOps.idiv

/** Reciprocal-rank fusion — the ONE definition of the hybrid-retrieval
  * fusion arithmetic, shared by the registered queries (q113's
  * brute-force pair, q121/q132's index-backed pair via
  * `CurationQ7.fuseSearch`) and the packaged driver workload
  * ([[graft.pipelines.DailyDriver.hybridSearch]]), so the three paths
  * cannot drift.
  *
  * Σ 1/(K + rank) with each reciprocal quantized by ONE integer
  * division at [[Scale]], so the fused score is an order-free integer
  * sum (the oracle compares it bitwise); `rrf` is a display-only final
  * division. Candidate lists join FULL OUTER on (query, document): a
  * document missing from one list contributes only the other's
  * reciprocal, and its absent rank surfaces as 0.
  *
  * Scale shape: both inputs are workload×depth-sized (each generator's
  * top-`depth` per query), so the fusion join and per-query rank window
  * are tiny regardless of corpus size.
  *
  * Reference: Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion
  * outperforms Condorcet and individual Rank Learning Methods" (SIGIR
  * 2009) — K = 60 is the paper's constant.
  */
object Rrf {

  /** The standard RRF fusion constant. */
  val K = 60L

  /** Fixed-point scale for the quantized reciprocals. */
  val Scale = 1000000L

  /** Fuse two ranked candidate lists into the top-`k` per query.
    *
    * @param lex (q_id, doc_id, rb) — first generator's rank, 1-based
    * @param vec (q_id, doc_id, rv) — second generator's rank, 1-based
    * @return (q_id, rk, doc_id, rb, rv, rrf_s, rrf) ordered by
    *         (q_id, rk), absent ranks as 0 */
  def fuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val wf = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_s").desc, col("doc_id").asc)
    lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_s",
        coalesce(idiv(lit(Scale), col("rb") + K), lit(0L)) +
          coalesce(idiv(lit(Scale), col("rv") + K), lit(0L)))
      .withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= k)
      .withColumn("rrf",
        col("rrf_s").cast(DoubleType) / lit(Scale).cast(DoubleType))
      .select(col("q_id"), col("rk"), col("doc_id"),
        coalesce(col("rb"), lit(0)).as("rb"),
        coalesce(col("rv"), lit(0)).as("rv"),
        col("rrf_s"), col("rrf"))
      .orderBy(col("q_id"), col("rk"))
  }
}
