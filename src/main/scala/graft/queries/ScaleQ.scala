package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFunctions._
import SimilarityQ.{dotFold, sqlDotFold}
import QueryDsl.{dsum, sqlDsum}

/** The 100 TB scale-path batch: IVF-bucketed ANN (the index an exact
  * brute-force top-k like q34 validates), word-n-gram shingle Jaccard
  * near-dup (finer-grained than the token-set MinHash of q32), and a
  * closed-form moment fit of a Gaussian to a histogram (the distributed
  * replacement for the iterative `leastsq` fit in
  * `fluxcal/snr.py:536-542`).
  */
object ScaleQ {

  /** IVF-style ANN over embeddings: deterministic coarse quantizer
    * (vectors 0..15 as centroids), every vector assigned to its
    * nearest-by-cosine centroid, probes search only their own cell.
    * Plan shape at fleet scale: the centroid table broadcasts, assignment
    * is per-row map work, and the search join shuffles only on the cell
    * id — never all-pairs. Cosines use the native `float_dot` codegen
    * kernel. */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("norm", sqrt(dotFold(col("embedding"), col("embedding"))))
    val cent = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cid").asc)
    val assign = emb.crossJoin(broadcast(cent))
      .withColumn("cos_c",
        dotFold(col("embedding"), col("c_emb")) / (col("norm") * col("c_norm")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"), col("norm"))
    val probes = assign.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("cid").as("q_cid"),
        col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val scored = assign.join(broadcast(probes),
        col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        dotFold(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 10)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  private val q55Sql =
    s"""WITH emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS norm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm AS c_norm
       |  FROM emb WHERE vec_id < 16),
       |cand AS (SELECT e.vec_id, e.embedding, e.norm, c.cid,
       |    ${sqlDotFold("e.embedding", "c.c_emb")} / (e.norm * c.c_norm) AS cos_c
       |  FROM emb e CROSS JOIN cent c),
       |asg AS (SELECT vec_id, embedding, norm, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid ASC) AS rn
       |  FROM cand),
       |a AS (SELECT vec_id, cid, embedding, norm FROM asg WHERE rn = 1),
       |probes AS (SELECT vec_id AS q_id, cid AS q_cid, embedding AS q_emb, norm AS q_norm
       |  FROM a WHERE vec_id < 8),
       |scored AS (SELECT q_id, a.vec_id AS vec_id,
       |    ${sqlDotFold("a.embedding", "q_emb")} / (a.norm * q_norm) AS cos
       |  FROM a JOIN probes ON a.cid = q_cid AND a.vec_id <> q_id),
       |ranked AS (SELECT q_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  /** Multi-probe IVF search — the recall/cost knob of q55: corpus
    * vectors still live in exactly ONE cell (the index build is
    * unchanged), but each probe searches its `nprobe = 2` nearest cells.
    * Probe cell lists stay a broadcast dimension (8 probes × 2 cells);
    * the search join still shuffles only on the cell id, reading ~2/k of
    * the corpus per probe instead of 1/k — the standard way to buy
    * recall without touching the index. */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("norm", sqrt(dotFold(col("embedding"), col("embedding"))))
    val cent = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cid").asc)
    val ranked = emb.crossJoin(broadcast(cent))
      .withColumn("cos_c",
        dotFold(col("embedding"), col("c_emb")) / (col("norm") * col("c_norm")))
      .withColumn("rn", row_number().over(wAssign))
    val assign = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"), col("norm"))
    val probeCells = ranked.filter(col("vec_id") < 8 && col("rn") <= 2)
      .select(col("vec_id").as("q_id"), col("cid").as("q_cid"),
        col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val scored = assign.join(broadcast(probeCells),
        col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        dotFold(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 10)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  private val q80Sql =
    s"""WITH emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS norm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm AS c_norm
       |  FROM emb WHERE vec_id < 16),
       |ranked AS (SELECT e.vec_id, e.embedding, e.norm, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlDotFold("e.embedding", "c.c_emb")} / (e.norm * c.c_norm) DESC,
       |        c.cid ASC) AS rn
       |  FROM emb e CROSS JOIN cent c),
       |a AS (SELECT vec_id, cid, embedding, norm FROM ranked WHERE rn = 1),
       |probes AS (SELECT vec_id AS q_id, cid AS q_cid, embedding AS q_emb, norm AS q_norm
       |  FROM ranked WHERE vec_id < 8 AND rn <= 2),
       |scored AS (SELECT q_id, a.vec_id AS vec_id,
       |    ${sqlDotFold("a.embedding", "q_emb")} / (a.norm * q_norm) AS cos
       |  FROM a JOIN probes ON a.cid = q_cid AND a.vec_id <> q_id),
       |rankedq AS (SELECT q_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, rk, vec_id, cos FROM rankedq WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  /** Word-3-gram shingle Jaccard near-dup, blocked on (lang, source):
    * shingles are poly-hashed token trigrams (order-sensitive, unlike the
    * token-set view of q32), pairs form only inside a block, with the
    * size-ratio prune inside the join. The shingle dim is one hashed
    * fixed-width array per doc, broadcast into the pair join. */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"), col("source"),
        wordShingles3(col("tk")).as("sh"))
      .withColumn("n", size(col("sh")).cast(LongType))
      // probe side of the pair join: re-spread the few-partition doc scan
      // so the quadratic block-pair fan-out uses every core (AQE would
      // coalesce this tiny shuffle — input bytes mispredict stage cost)
      .repartition(32, col("doc_id"))
      .cache()
    val pairs = sh.as("x").join(broadcast(sh.as("y")),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.doc_id") < col("y.doc_id") &&
          least(col("x.n"), col("y.n")) * 2 >= greatest(col("x.n"), col("y.n")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sh").as("sh_a"), col("y.sh").as("sh_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .withColumn("n_inter",
        call_function("sorted_intersect_count", col("sh_a"), col("sh_b")).cast(LongType))
      .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      .withColumn("jaccard", col("n_inter").cast(DoubleType) / col("n_union").cast(DoubleType))
      .filter(col("jaccard") >= 0.5)
    pairs.select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q56Sql = {
    val gram = "concat_ws(' ', tk[g], tk[g+1], tk[g+2])"
    s"""WITH tk AS (SELECT doc_id, lang, source, ${sqlTokens("text")} AS tk FROM documents),
       |sh AS (SELECT doc_id, lang, source,
       |    CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(
       |      range(1, len(tk) - 1), g -> ${sqlStrHash(gram)}))
       |    ELSE CAST([] AS BIGINT[]) END AS sh
       |  FROM tk),
       |sized AS (SELECT doc_id, lang, source, sh, CAST(len(sh) AS BIGINT) AS n FROM sh),
       |pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS n_inter,
       |    x.n AS na, y.n AS nb
       |  FROM sized x JOIN sized y
       |    ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
       |    AND least(x.n, y.n) * 2 >= greatest(x.n, y.n))
       |SELECT doc_a, doc_b, n_inter, na + nb - n_inter AS n_union,
       |  CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE) AS jaccard
       |FROM pairs
       |WHERE CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** A19 as a distributed closed form: moment-matched Gaussian over the
    * 40-bucket price histogram — integer-exact sums (bucket index ×
    * count), one double division at the end, so the result is bitwise
    * portable. Peak location ties break to the lowest bucket. */
  private def q57(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.lineitem(s, d)
      .withColumn("bucket", least(floor(col("l_extendedprice") / 5000.0), lit(39L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("c"))
    val mom = hist.agg(
      sum(col("c")).as("n"),
      sum(col("bucket") * col("c")).as("s1"),
      sum(col("bucket") * col("bucket") * col("c")).as("s2"),
      max(col("c")).as("peak_count"))
    val peakB = hist.join(broadcast(mom.select(col("peak_count"))),
        col("c") === col("peak_count"))
      .agg(min(col("bucket")).as("peak_bucket"))
    val nD = col("n").cast(DoubleType)
    val mu = col("s1").cast(DoubleType) / nD
    mom.crossJoin(broadcast(peakB)).select(
      col("n"),
      mu.as("mu_idx"),
      (col("s2").cast(DoubleType) / nD - mu * mu).as("var_idx"),
      col("peak_count"), col("peak_bucket"))
  }

  private val q57Sql =
    """WITH hist AS (SELECT least(CAST(floor(l_extendedprice / 5000.0) AS BIGINT), 39) AS bucket,
      |    COUNT(*) AS c FROM lineitem GROUP BY 1),
      |mom AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(bucket * c) AS BIGINT) AS s1,
      |    CAST(SUM(bucket * bucket * c) AS BIGINT) AS s2, MAX(c) AS peak_count FROM hist),
      |pk AS (SELECT MIN(bucket) AS peak_bucket FROM hist, mom WHERE c = peak_count)
      |SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu_idx,
      |  CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS var_idx,
      |  peak_count, peak_bucket
      |FROM mom, pk""".stripMargin

  /** Multimodal data-plane pass: documents as opaque binary payloads with
    * a typed metadata struct → aspect-preserving resize → every-2nd-frame
    * sampling → per-kind totals. The codec itself is stubbed
    * (environment has no media libs), but this exercises the real
    * operators (`Multimodal.mediaFromDocuments/resizeMeta/sampleFrames`)
    * end-to-end through the SQL data plane with an exact oracle. */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val media = graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, d))
    val resized = graft.operators.Multimodal.resizeMeta(media, 128)
    val base = resized.select(col("media_id"), col("kind"),
        octet_length(col("payload")).as("n_bytes"),
        col("meta.width").as("rw"), col("meta.height").as("rh"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast(LongType)).as("total_bytes"),
        sum(col("rw").cast(LongType)).as("total_w"),
        sum(col("rh").cast(LongType)).as("total_h"))
    val frames = graft.operators.Multimodal.sampleFrames(media, 2)
      .groupBy(col("kind")).agg(count(lit(1)).as("n_sampled_frames"))
    base.join(frames, Seq("kind"))
      .select(col("kind"), col("n_media"), col("total_bytes"),
        col("total_w"), col("total_h"), col("n_sampled_frames"))
      .orderBy(col("kind"))
  }

  private val q61Sql =
    """WITH media AS (SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |    encode(text) AS payload,
      |    CAST(n_chars % 64 + 8 AS INTEGER) AS width,
      |    CAST(n_chars % 48 + 8 AS INTEGER) AS height,
      |    CAST(n_chars % 10 + 1 AS INTEGER) AS n_frames
      |  FROM documents),
      |resized AS (SELECT media_id, kind, payload, n_frames,
      |    CAST(trunc(width * least(128.0 / greatest(width, height), 1.0)) AS INTEGER) AS rw,
      |    CAST(trunc(height * least(128.0 / greatest(width, height), 1.0)) AS INTEGER) AS rh
      |  FROM media),
      |base AS (SELECT kind, COUNT(*) AS n_media,
      |    CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
      |    CAST(SUM(rw) AS BIGINT) AS total_w, CAST(SUM(rh) AS BIGINT) AS total_h
      |  FROM resized GROUP BY kind),
      |frames AS (SELECT kind,
      |    CAST(SUM(CAST(floor((n_frames - 1) / 2.0) AS BIGINT) + 1) AS BIGINT) AS n_sampled_frames
      |  FROM media GROUP BY kind)
      |SELECT base.kind AS kind, n_media, total_bytes, total_w, total_h, n_sampled_frames
      |FROM base JOIN frames ON base.kind = frames.kind
      |ORDER BY kind""".stripMargin

  /** SimHash near-dup pairs via pigeonhole band blocking over the WIDE
    * 60-bit signature (the scale-safe default — round-4's measured
    * scale-killer was the 32-bit/8-bit-band form, which is retained as
    * the spec-pinned narrow contract, [[simhash32Pairs]]): split the
    * signature into `bands` disjoint `bits`-bit bands; any pair within
    * Hamming distance ≤ bands−1 differs in at most bands−1 bands, so it
    * MUST agree on at least one. The blocked join is therefore exactly
    * equivalent to the brute-force all-pairs scan the oracle runs, but
    * shuffles only (band, key) bucket collisions — and band WIDTH is the
    * corpus-size scaling knob: per-band occupancy is n/2^bits, so wider
    * bands hold the bucket fan-out linear where fixed 8-bit blocks grew
    * it quadratically (README scaling table). Pairs are emitted once via
    * first-matching-band (same dedup-in-join trick as q32). */
  private[queries] def simhash60Pairs(docs: DataFrame, bands: Int, bits: Int,
                                      maxHam: Int): DataFrame = {
    require(bands * bits == 60, s"bands·bits must cover the 60-bit signature; got $bands×$bits")
    require(maxHam < bands, s"pigeonhole needs maxHam < bands; got $maxHam vs $bands")
    val sig = docs
      .select(col("doc_id"),
        call_function("simhash60",
          transform(array_distinct(tokens(col("text"))),
            t => strHash(t) * lit(1073741824L) + strHash2(t))).as("simhash"))
    def bandOf(c: Column, b: Int): Column =
      shiftright(c, bits * b).bitwiseAND(lit((1L << bits) - 1))
    val sigb = sig
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until bands).map(b => bandOf(col("simhash"), b)): _*))
          .as(Seq("band", "key")))
      // fan-out probe side: same AQE-coalescing blind spot as q32/q56
      .repartition(32, col("doc_id"))
      .cache()
    def bandEq(b: Int): Column =
      bandOf(col("x.simhash"), b) === bandOf(col("y.simhash"), b)
    val earlier = (0 until bands - 1).map(b => col("x.band") > b && bandEq(b))
      .reduce(_ || _)
    val ham = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast(LongType)
    sigb.as("x").join(broadcast(sigb.as("y")),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id") && !earlier)
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHam)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The round-4 scale-killer, kept as the NARROW CONTRACT (not
    * registered): 32-bit signatures in 4×8-bit bands — 256 bucket values
    * per band lets occupancy grow linearly with the corpus, so candidate
    * pairs grow quadratically. SimilaritySpec pins its exact equivalence
    * to the brute-force scan so the pigeonhole algebra stays proven at
    * every width. */
  private[queries] def simhash32Pairs(docs: DataFrame): DataFrame = {
    val sig = docs
      .select(col("doc_id"),
        call_function("simhash32",
          transform(array_distinct(tokens(col("text"))), strHash(_))).as("simhash"))
    def byteOf(c: Column, b: Int): Column = shiftright(c, 8 * b).bitwiseAND(lit(255L))
    val sigb = sig
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b => byteOf(col("simhash"), b)): _*))
          .as(Seq("band", "key")))
      .repartition(32, col("doc_id"))
      .cache()
    def bandEq(b: Int): Column =
      byteOf(col("x.simhash"), b) === byteOf(col("y.simhash"), b)
    val earlier = (0 until 3).map(b => col("x.band") > b && bandEq(b)).reduce(_ || _)
    val ham = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast(LongType)
    sigb.as("x").join(broadcast(sigb.as("y")),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id") && !earlier)
      .withColumn("hamming", ham)
      .filter(col("hamming") <= 3)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q62: the DEFAULT SimHash near-dup generator — 4×15-bit bands,
    * Hamming ≤ 3 (the guarantee the narrow form gave, at 2⁷× lower
    * per-band occupancy). */
  private def q62(s: SparkSession, d: String): DataFrame =
    simhash60Pairs(Tables.documents(s, d), bands = 4, bits = 15, maxHam = 3)

  /** Brute-force 60-bit oracle at a given Hamming threshold — shared by
    * q62 (≤3) and q78 (≤4): DuckDB re-derives the pairs with no banding
    * at all, so the blocked join's exact-equivalence claim is what the
    * driver checks. */
  private def simhash60Sql(maxHam: Int): String = {
    val h60 = s"${sqlStrHash("tok")} * 1073741824 + ${sqlStrHash2("tok")}"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(${sqlTokens("text")})) AS tok FROM documents),
       |hashed AS (SELECT doc_id, $h60 AS th FROM toks),
       |bits AS (SELECT unnest(range(0, 60)) AS j),
       |votes AS (SELECT doc_id, j,
       |    SUM(CASE WHEN (th >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hashed CROSS JOIN bits GROUP BY doc_id, j),
       |sig AS (SELECT doc_id,
       |    SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) ELSE 0 END * CAST(pow(2.0, j) AS BIGINT)) AS simhash
       |  FROM votes GROUP BY doc_id)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
       |WHERE CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) <= $maxHam
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val q62Sql = simhash60Sql(3)

  /** Embedding-cosine near-dup PAIRS — the embedding leg of the dedup
    * family (token-set MinHash q32, shingle Jaccard q56, SimHash q62):
    * vectors IVF-assign to their nearest centroid cell, candidate pairs
    * form ONLY inside a cell (blocked self-join keyed on cell id — the
    * shuffle moves each vector once, never all-pairs), and the exact
    * cosine computed with the `float_dot` codegen kernel verifies each
    * candidate against the threshold. Recall is governed by the coarse
    * quantizer exactly as in any IVF dedup; the oracle re-derives the
    * same blocked pair set. */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("norm", sqrt(dotFold(col("embedding"), col("embedding"))))
    val cent = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cid").asc)
    val assign = emb.crossJoin(broadcast(cent))
      .withColumn("cos_c",
        dotFold(col("embedding"), col("c_emb")) / (col("norm") * col("c_norm")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"), col("norm"))
    val a = assign.select(col("vec_id").as("a_id"), col("cid"),
      col("embedding").as("a_emb"), col("norm").as("a_norm"))
    val b = assign.select(col("vec_id").as("b_id"), col("cid"),
      col("embedding").as("b_emb"), col("norm").as("b_norm"))
    a.join(b, Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      // pushdown fence (same hazard q32 documents): without it Catalyst
      // folds the threshold filter into the join residual and evaluates
      // the float_dot kernel TWICE per candidate pair
      .withColumn("pushdown_fence", monotonically_increasing_id())
      .withColumn("cos",
        dotFold(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")))
      .filter(col("cos") >= 0.35)
      .select(col("a_id"), col("b_id"), col("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q65Sql =
    s"""WITH emb AS (SELECT vec_id, embedding,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS norm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm AS c_norm
       |  FROM emb WHERE vec_id < 16),
       |cand AS (SELECT e.vec_id, e.embedding, e.norm, c.cid,
       |    ${sqlDotFold("e.embedding", "c.c_emb")} / (e.norm * c.c_norm) AS cos_c
       |  FROM emb e CROSS JOIN cent c),
       |asg AS (SELECT vec_id, embedding, norm, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid ASC) AS rn
       |  FROM cand),
       |a AS (SELECT vec_id, cid, embedding, norm FROM asg WHERE rn = 1)
       |SELECT x.vec_id AS a_id, y.vec_id AS b_id,
       |  ${sqlDotFold("x.embedding", "y.embedding")} / (x.norm * y.norm) AS cos
       |FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |WHERE ${sqlDotFold("x.embedding", "y.embedding")} / (x.norm * y.norm) >= 0.35
       |ORDER BY a_id, b_id""".stripMargin

  /** Dedup pairs → dedup DECISIONS: connected components over a pair
    * graph via `DedupGroups.canonicalize` (iterative min-label
    * propagation, one shuffle join per round, rounds = component
    * diameter). The synthetic pair graph is chains of five 5-doc star
    * blocks (diameter 6), so convergence genuinely iterates; the oracle
    * re-derives components with a recursive CTE — an independent
    * fixpoint formulation of the same semantics. */
  private def q66(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val starEdges = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("a"), (col("doc_id") - col("doc_id") % 5).as("b"))
    val chainEdges = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 25 =!= 0)
      .select(col("doc_id").as("a"), (col("doc_id") - 5).as("b"))
    graft.operators.DedupGroups
      .canonicalize(starEdges.unionByName(chainEdges), "a", "b")
      .orderBy(col("doc_id"))
  }

  private val q66Sql =
    """WITH RECURSIVE
      |e AS (
      |  SELECT doc_id AS a, doc_id - doc_id % 5 AS b FROM documents WHERE doc_id % 5 <> 0
      |  UNION ALL
      |  SELECT doc_id AS a, doc_id - 5 AS b FROM documents WHERE doc_id % 5 = 0 AND doc_id % 25 <> 0),
      |und AS (SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
      |verts AS (SELECT DISTINCT src AS id FROM und),
      |reach(id, lab) AS (
      |  SELECT id, id FROM verts
      |  UNION
      |  SELECT u.src, r.lab FROM und u JOIN reach r ON u.dst = r.id)
      |SELECT id AS doc_id, MIN(lab) AS canonical_id
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** Skew-mitigated dimension join: lineitem collapsed onto THREE hot
    * keys (worst-case power law — every row is hot) joined to a 3-row
    * dim through `SkewJoin.saltedEquiJoin`, which splits each hot key
    * into 8 deterministic sub-keys so the join parallelizes across 24
    * tasks instead of 3. The oracle is the PLAIN join — salting must be
    * row-for-row semantics-preserving, and the driver's hash compare
    * proves it on real data. */
  private def q75(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d).withColumn("k", col("l_suppkey") % 3)
    val dim = Tables.nation(s, d)
      .groupBy((col("n_nationkey") % 3).as("k"))
      .agg(min(col("n_name")).as("grp"))
    graft.operators.SkewJoin
      .saltedEquiJoin(fact, dim, Seq("k"), col("l_orderkey"), nSalts = 8)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("grp"))
  }

  private val q75Sql =
    s"""WITH dim AS (SELECT n_nationkey % 3 AS k, MIN(n_name) AS grp
       |  FROM nation GROUP BY n_nationkey % 3)
       |SELECT grp, COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN dim ON l_suppkey % 3 = k
       |GROUP BY grp ORDER BY grp""".stripMargin

  /** Train-then-search: `KMeans.lloyd` trains the IVF coarse quantizer on
    * the corpus itself (k=4, 2 Lloyd rounds — deterministic: lowest-id
    * init, lowest-cid tie-break, float32 centroid rounding drowning the
    * last-ulp jitter of distributed means), `KMeans.assign` builds the
    * (vector, cell) index, and probes search only their own cell — q55's
    * search plan with TRAINED centroids instead of fixed ones.
    *
    * Scale shape: training is iters × (broadcast-assign + one (cell,dim)
    * shuffle); the assignment joined back to the corpus is a co-partitioned
    * equi-join on the id (at fleet scale the index build persists this
    * partitioned by cell); the search join shuffles only on cell id. */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // ONE prep+spread materialization feeds the trainer AND the index
    // assignment (round 14, guide §1.2 — the round-13 shape prepped and
    // shuffled the scan twice, and the second spread was the
    // VERDICT-flagged q77 regression)
    val pvecs = graft.operators.KMeans.prepSpread(emb, "vec_id", "embedding")
    val cents = graft.operators.KMeans.lloydPrepared(pvecs, k = 4, iters = 2)
    val asg = graft.operators.KMeans
      .assignTopPrepared(pvecs, "vec_id", cents, nprobe = 1)
      .select(col("vec_id"), col("cid"))
    val vecs = emb
      .withColumn("norm", sqrt(dotFold(col("embedding"), col("embedding"))))
      .filter(col("norm") > 0.0)
      .join(asg, "vec_id")
    val probes = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("cid").as("q_cid"),
        col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val scored = vecs.join(broadcast(probes),
        col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        dotFold(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("q_cid"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** The oracle unrolls the two Lloyd rounds as CTE pairs (assign aN,
    * re-estimate cN): identical init, identical tie-breaks, per-dimension
    * AVG cast to float32 exactly as the trainer does. */
  private val q77Sql = {
    def round(prev: String, n: Int): String =
      s"""a$n AS (SELECT id, v, nrm, cid,
         |    ROW_NUMBER() OVER (PARTITION BY id
         |      ORDER BY ${sqlDotFold("v", "c_vec")} / (nrm * c_norm) DESC, cid ASC) AS rn
         |  FROM vecs CROSS JOIN $prev),
         |m$n AS (SELECT cid, i, CAST(AVG(v[i + 1]) AS FLOAT) AS m
         |  FROM a$n, range(64) t(i) WHERE rn = 1 GROUP BY cid, i),
         |c$n AS (SELECT cid, c_vec, sqrt(${sqlDotFold("c_vec", "c_vec")}) AS c_norm
         |  FROM (SELECT cid, list(m ORDER BY i) AS c_vec FROM m$n GROUP BY cid))"""
        .stripMargin
    s"""WITH emb AS (SELECT vec_id AS id, embedding AS v,
       |    sqrt(${sqlDotFold("embedding", "embedding")}) AS nrm FROM embeddings),
       |vecs AS (SELECT * FROM emb WHERE nrm > 0.0),
       |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS cid,
       |    v AS c_vec, nrm AS c_norm
       |  FROM (SELECT * FROM vecs ORDER BY id LIMIT 4)),
       |${round("c0", 1)},
       |${round("c1", 2)},
       |af AS (SELECT id, v, nrm, cid,
       |    ROW_NUMBER() OVER (PARTITION BY id
       |      ORDER BY ${sqlDotFold("v", "c_vec")} / (nrm * c_norm) DESC, cid ASC) AS rn
       |  FROM vecs CROSS JOIN c2),
       |asg AS (SELECT id, v, nrm, cid FROM af WHERE rn = 1),
       |probes AS (SELECT id AS q_id, cid AS q_cid, v AS q_v, nrm AS q_nrm
       |  FROM asg WHERE id < 8),
       |scored AS (SELECT q_id, q_cid, a.id AS vec_id,
       |    ${sqlDotFold("a.v", "q_v")} / (a.nrm * q_nrm) AS cos
       |  FROM asg a JOIN probes ON a.cid = q_cid AND a.id <> q_id),
       |ranked AS (SELECT q_id, q_cid, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, q_cid, rk, vec_id, cos FROM ranked WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin
  }

  /** q78: the far end of the same generator's scale dial — 3×20-bit
    * bands, Hamming ≤ 2. Fewer, wider bands mean 2²⁰ bucket values per
    * band (32× q62's occupancy headroom) at a tighter distance
    * guarantee: the high-precision / minimum-fan-out setting a corpus
    * owner dials toward as the corpus grows past what 15-bit bands
    * hold. Same kernel, same oracle shape — the band-count/width pair
    * is an explicit knob, not a new operator. */
  private def q78(s: SparkSession, d: String): DataFrame =
    simhash60Pairs(Tables.documents(s, d), bands = 3, bits = 20, maxHam = 2)

  private val q78Sql = simhash60Sql(2)


  val queries: Seq[GQuery] = Seq(
    GQuery("q55_ivf_ann", q55, Some(q55Sql), Seq("O1", "O4", "A16")),
    GQuery("q56_ngram_jaccard", q56, Some(q56Sql), Seq("A16", "J7")),
    GQuery("q57_gauss_moments", q57, Some(q57Sql), Seq("A18", "A19")),
    GQuery("q61_multimodal_meta", q61, Some(q61Sql), Seq("S3", "F11")),
    GQuery("q62_simhash_neardup", q62, Some(q62Sql), Seq("A16", "J7")),
    GQuery("q65_cosine_neardup", q65, Some(q65Sql), Seq("A16", "J7", "O1")),
    GQuery("q66_dedup_groups", q66, Some(q66Sql), Seq("A16", "U3", "W2")),
    GQuery("q75_salted_join", q75, Some(q75Sql), Seq("J6", "A17")),
    GQuery("q77_ivf_trained_ann", q77, Some(q77Sql), Seq("A16", "O1", "O4")),
    GQuery("q78_simhash60_neardup", q78, Some(q78Sql), Seq("A16", "J7")),
    GQuery("q80_ivf_multiprobe", q80, Some(q80Sql), Seq("A16", "O1", "O4")))
}
