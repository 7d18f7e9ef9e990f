package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Sketch tier for benchmark decontamination: a Bloom filter over the
  * benchmark shingle set, used as a no-false-negative gate BEFORE the
  * exact sorted-intersect verify (q70's kernel). The two-tier result is
  * EXACTLY the exact tier's result — a Bloom filter never rejects a
  * true member, so every document with real benchmark overlap survives
  * the gate, and the exact tier kills the false positives — which is
  * why the registered query (q114) shares q70's oracle verbatim.
  *
  * Why a sketch tier at 100 TB: the exact tier's sorted benchmark
  * array costs 8 bytes per distinct shingle broadcast to every
  * executor, and its per-document cost is a full merge-intersect. The
  * filter is ~1.2 bits per shingle per 10% false-positive point
  * (10⁹ bench shingles ≈ 1.2 GB at 1% vs 8 GB raw), and the gate is a
  * short-circuiting per-token probe — so the expensive tier runs only
  * on gated survivors (true overlaps + the fpp sliver). The filter
  * build is ONE aggregation over the bench side (bit-OR merge is
  * commutative and associative — the serialized bytes are
  * deterministic regardless of partitioning).
  *
  * The built filter travels as an expression LITERAL (Spark's own
  * runtime-filtering expressions require a constant/scalar-subquery
  * bloom side) — it ships once per stage with the task binary, the same
  * distribution class as a broadcast variable.
  */
object BloomDecontam {

  /** Aggregate a LongType hash column into serialized Bloom-filter
    * bytes. `numBits` pins the filter size (deterministic layout);
    * callers size it ~10 bits/item for ~1% fpp. */
  def trainBits(hashes: DataFrame, hashCol: String,
                expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(col(hashCol)),
      Literal(expectedItems), Literal(numBits))
    hashes.select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Membership probe against a built filter — a codegen'd bit test,
    * usable inside higher-order-function lambdas (the gate below probes
    * per shingle with short-circuiting `exists`). */
  def mightContain(bloomBits: Array[Byte], h: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBits, BinaryType),
      ColumnBridge.expression(h)))

  /** The gate: keep rows whose sorted-shingle-array column has at least
    * one member hitting the filter. No false negatives: a pruned row
    * provably has zero exact overlap. */
  def anyHit(bloomBits: Array[Byte], shingles: Column): Column =
    exists(shingles, h => mightContain(bloomBits, h))
}
