package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory cardinality sketches for corpus statistics.
  *
  * The production question "how many DISTINCT shingles / tokens / urls per
  * language" is the classic 100 TB trap: an exact answer is a corpus-grain
  * `distinct` — a full shuffle of every (lang, value) pair just to count
  * them. The K-minimum-values (KMV) sketch answers it with a bounded
  * buffer: keep the k smallest distinct HASH values seen; if fewer than k
  * exist the count is exact, otherwise the kth smallest hash `h_k` of a
  * set of D uniform draws on [0, M) sits near `k·M/D`, so
  * `D ≈ (k-1)·M/h_k` (the unbiased KMV estimator, Bar-Yossef et al. 2002).
  *
  * Scale shape: the aggregator is a monoid (merge = sorted-array union
  * truncated to k), so Spark runs it with MAP-SIDE partial aggregation —
  * each task ships one ≤k-element array per group, never the values
  * themselves. The shuffle is O(groups · k) regardless of corpus size,
  * vs O(distinct values) for exact `count_distinct`. Deterministic: the
  * k smallest distinct values of a set are order-free, so the result is
  * bitwise reproducible and oracle-checkable (the DuckDB side derives the
  * same min-k with a rank window — affordable at test scale, which is
  * precisely the contrast the sketch exists to avoid at fleet scale).
  */
object Sketches {

  /** Sorted ascending, distinct, at most k elements. `data` may carry
    * slack capacity past `n` (the reduce path grows it geometrically);
    * only `data(0 until n)` is meaningful. */
  final case class KmvBuf(n: Int, data: Array[Long])

  private val kmvEnc: Encoder[KmvBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KmvBuf]()

  /** Keep the k smallest distinct hash values of the input column. */
  final class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    def zero: KmvBuf = KmvBuf(0, Array.empty)

    def reduce(b: KmvBuf, h: Long): KmvBuf = {
      // Full buffer and h past the current kth smallest: drop on the floor.
      if (b.n == k && h >= b.data(b.n - 1)) return b
      val pos = {
        val i = java.util.Arrays.binarySearch(b.data, 0, b.n, h)
        if (i >= 0) return b // already present — distinct-ness is the point
        -i - 1
      }
      // copy only when genuinely growing: a saturated buffer (n == k ==
      // data.length) shifts in place — the insert drops the last element,
      // so no extra capacity is needed and the hot reduce path stays
      // allocation-free once the buffer fills
      val out =
        if (b.n < b.data.length || b.data.length == k) b.data
        else java.util.Arrays.copyOf(b.data, math.min(k, math.max(16, b.data.length * 2)))
      val keep = math.min(b.n + 1, k)
      // shift the tail right by one, dropping the last element if full
      System.arraycopy(out, pos, out, pos + 1, keep - pos - 1)
      out(pos) = h
      KmvBuf(keep, out)
    }

    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val out = new Array[Long](math.min(a.n + b.n, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.n || j < b.n)) {
        val takeA = j >= b.n || (i < a.n && a.data(i) <= b.data(j))
        val v = if (takeA) a.data(i) else b.data(j)
        if (takeA) i += 1 else j += 1
        if (i < a.n && a.data(i) == v) i += 1 // cross-buffer duplicate
        if (j < b.n && b.data(j) == v) j += 1
        out(o) = v; o += 1
      }
      KmvBuf(o, if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    def finish(b: KmvBuf): Seq[Long] =
      (if (b.n == b.data.length) b.data
       else java.util.Arrays.copyOf(b.data, b.n)).toSeq

    def bufferEncoder: Encoder[KmvBuf] = kmvEnc
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** kmv_min_k(h) → ascending array of the ≤k smallest distinct hashes. */
  def kmvMinK(h: Column, k: Int): Column = udaf(new KmvAgg(k)).apply(h)
}
