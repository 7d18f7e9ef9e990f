package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Deterministic, engine-portable text primitives.
  *
  * The polynomial rolling hash (h = h*31 + code mod 1e9+7) is the shared
  * fingerprint primitive for exact dedup, MinHash, and SimHash — chosen
  * over Spark's builtin xxhash64 because it is reproducible in plain ANSI
  * SQL (the DuckDB oracle) and in any other engine a user would validate
  * against. Document fingerprinting in the reference sense: rolling hash
  * over content (cf. dedup of filenames `LTA/lta-retrieve.py:466-468`).
  *
  * All functions are Column algebra over Spark's codegen'd higher-order
  * functions — no Scala UDFs, so whole-stage codegen stays intact and the
  * operators scale: per-row work only, no shuffle, no driver involvement.
  */
object TextFunctions {
  val HashMod = 1000000007L

  /** Polynomial hash of a string: left fold (acc*31 + codePoint) % p.
    * Empty/null-safe: empty string hashes to 0.
    *
    * Backed by the native codegen expression [[graft.expressions.PolyHash]]
    * — single zero-allocation pass inside whole-stage codegen. Values are
    * identical to [[strHashColumnAlgebra]] (and the DuckDB oracle
    * fragment) on ASCII input. */
  def strHash(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.PolyHash(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** Independent second polynomial hash (mult 37, mod 998244353 < 2³⁰) —
    * combined with [[strHash]] as `strHash(t)·2³⁰ + strHash2(t)` it
    * yields a 60-bit token fingerprint with every op exact in 64-bit
    * integers on both engines (the wide-SimHash dedup path, q78). */
  def strHash2(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.PolyHash2(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** DuckDB-equivalent SQL fragment for [[strHash2]]. */
  def sqlStrHash2(e: String): String =
    s"CASE WHEN length($e) = 0 THEN 0 ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($e)+1), i -> CAST(ascii(substring($e, i, 1)) AS BIGINT))), " +
      s"(acc, x) -> (acc * 37 + x) % ${graft.expressions.PolyHash.Mod2}) END"

  /** Pure Column-algebra form of [[strHash]] — engine-portable reference
    * implementation (kept for cross-checking and for engines without the
    * extension installed). */
  def strHashColumnAlgebra(c: Column): Column = {
    // split-to-chars is O(L); per-index substring would rescan the string
    // per character (O(L²) on long documents)
    val codes = transform(split(c, ""), ch => ascii(ch).cast("long"))
    when(length(c) === 0, 0L).otherwise(
      aggregate(codes, lit(0L), (acc, x) => (acc * 31L + x) % HashMod))
  }

  /** DuckDB-equivalent SQL fragment for [[strHash]]. */
  def sqlStrHash(e: String): String =
    s"CASE WHEN length($e) = 0 THEN 0 ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($e)+1), i -> CAST(ascii(substring($e, i, 1)) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $HashMod) END"

  /** Content-defined-chunking boundary positions (1-based window-end
    * positions where the rolling w-code-point poly-hash ≡ 0 mod d) —
    * the O(L) [[graft.expressions.CdcBounds]] kernel, value-identical
    * to filtering `sequence(w, length)` on the per-window hash. */
  def cdcBounds(c: Column, w: Int, d: Long): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.CdcBounds(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), w, d))

  /** Whitespace tokens with empties dropped (trailing-space safe). */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  def sqlTokens(e: String): String =
    s"list_filter(string_split($e, ' '), t -> length(t) > 0)"

  val QualityStopwords: Seq[String] = Seq("the", "a", "of", "and", "is")

  /** Quality counter pack (q28 semantics): token count, summed token
    * length, stopword hits, punctuation count — exact integers, shared by
    * the batch queries and the curation pipeline so there is exactly one
    * definition of "quality".
    *
    * `toks` should be a MATERIALIZED token-array column (a prior
    * select/withColumn of [[tokens]]): three of the four counters read
    * it, so an inline `tokens(text)` argument would re-split the
    * document three times per row. With an attribute, CollapseProject
    * keeps the multiply-referenced split materialized. */
  def qualityCounters(toks: Column, text: Column): (Column, Column, Column, Column) = {
    val nTokens = size(toks).cast(LongType)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nStop = size(filter(toks,
      t => t.isin(QualityStopwords.map(lit(_)): _*))).cast(LongType)
    val nPunct = (length(text) -
      length(regexp_replace(text, "[.,!?;:]", ""))).cast(LongType)
    (nTokens, sumLen, nStop, nPunct)
  }

  /** Composite quality score over the counters — plain IEEE arithmetic
    * with a fixed op order, so it is bitwise portable across engines. */
  def qualityScore(nTokens: Column, sumLen: Column,
                   nStop: Column, nPunct: Column): Column =
    sumLen.cast(DoubleType) / nTokens.cast(DoubleType) * 0.25 +
      (lit(1.0) - nStop.cast(DoubleType) / nTokens.cast(DoubleType)) * 2.0 -
      nPunct.cast(DoubleType) * 0.1

  /** Sorted distinct poly-hashed word-3-gram shingles (q56/q70 form)
    * over an ALREADY MATERIALIZED token-array column. Sorted so
    * downstream intersection uses the zero-allocation
    * `sorted_intersect_count` kernel; < 3 tokens → empty set.
    *
    * The input MUST be an attribute (a prior select/withColumn), not an
    * inline `tokens(text)` expression: `tk` is referenced inside
    * per-element transform lambdas, where Catalyst re-evaluates a
    * non-attribute subtree PER SHINGLE INDEX — re-splitting the document
    * O(L) times (measured 7× wall blowup at sf0.1). The two-step select
    * is safe: CollapseProject keeps a multiply-referenced non-cheap
    * projection materialized rather than inlining it. */
  def wordShingles3(tk: Column): Column = wordShingles(tk, 3)

  /** Width-parameterized word-n-gram shingles — [[wordShingles3]]'s
    * general form. n = 3 is the battery default; production benchmark
    * decontamination typically runs 8–13-gram overlap (8 is the second
    * oracle-paired width, q122), where a shorter width overclaims
    * contamination on common phrases. Same input contract: `tk` MUST be
    * a materialized attribute. */
  def wordShingles(tk: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1; got $n")
    when(size(tk) >= n,
      array_sort(array_distinct(transform(sequence(lit(1), size(tk) - (n - 1)),
        g => strHash(concat_ws(" ",
          (0 until n).map(j => element_at(tk, g + j)): _*))))))
      .otherwise(array().cast(ArrayType(LongType)))
  }

  /** DuckDB-equivalent fragment for [[wordShingles]] over a token-list
    * column expression `tk` (n = 3 reproduces the q70 oracle form). */
  def sqlWordShingles(tk: String, n: Int): String = {
    val gram = s"concat_ws(' ', ${(0 until n).map {
      case 0 => s"$tk[g]"
      case j => s"$tk[g+$j]"
    }.mkString(", ")})"
    s"CASE WHEN len($tk) >= $n THEN list_sort(list_distinct(list_transform(" +
      s"range(1, len($tk) - ${n - 2}), g -> ${sqlStrHash(gram)}))) " +
      s"ELSE CAST([] AS BIGINT[]) END"
  }

  /** MinHash permutation parameters: h_k(x) = (a_k * x + b_k) mod p.
    * Small odd multipliers; k is 0-based.
    *
    * Two signature grains share these arrays:
    *  - the NARROW form, the first [[MinhashK]] permutations banded as
    *    2×4 — q31's per-doc signature contract and the spec-pinned
    *    legacy banding;
    *  - the WIDE form, [[MinhashWideK]] permutations banded as
    *    [[MinhashBands]] bands × [[MinhashBandRows]] rows — the DEFAULT
    *    candidate-generation scheme everywhere pairs are produced
    *    (q32, the curation pipelines, the streaming index). Wider bands
    *    collapse the per-band collision probability from J⁴ to J⁸, which
    *    is what keeps bucket fan-out from growing quadratically with the
    *    corpus (the fixed-width-blocking scale killer: README §scaling);
    *    the extra band keeps recall at high J comparable. */
  val MinhashK = 8
  val MinhashWideK = 24
  val MinhashBands = 3
  val MinhashBandRows = 8
  val MinhashA: Seq[Long] = Seq(
    769L, 1543L, 3079L, 6151L, 12289L, 24593L, 49157L, 98317L,
    196613L, 393241L, 786433L, 1572869L, 3145739L, 6291469L,
    12582917L, 25165843L, 50331653L, 100663319L, 201326611L,
    402653189L, 805306457L, 899809363L, 920419813L, 961748927L)
  val MinhashB: Seq[Long] = Seq(
    12L, 345L, 6789L, 101112L, 131415L, 161718L, 192021L, 222324L,
    252627L, 282930L, 313233L, 343536L, 373839L, 404142L, 434445L,
    464748L, 495051L, 525354L, 555657L, 585960L, 616263L, 646566L,
    676869L, 707172L)
}
