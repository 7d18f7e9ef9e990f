package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based cross-validation of the native codegen kernels and the
  * BPE merge fold against independent driver-side reference models:
  * scalacheck generates randomized inputs (fixed seed — reproducible),
  * each property evaluates ONE Spark job over the whole batch, and every
  * row must match the model exactly. This is a different axis of
  * evidence than the hand-computed specs: the models share no code with
  * the kernels, so agreement on hundreds of adversarial inputs pins the
  * semantics, not the examples.
  */
class KernelPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("scalacheck generator exhausted"))

  // ---------------------------------------------------------------- hashes

  private def refPolyHash(s: String, mult: Long, mod: Long): Long =
    if (s.isEmpty) 0L
    else s.foldLeft(0L)((acc, c) => (acc * mult + c.toLong) % mod)

  test("poly_hash and poly_hash2 match the modular-fold model on random ASCII") {
    val asciiStr = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar))
    } yield cs.mkString
    val inputs = samples(asciiStr, 300, seed = 42L)
    val rows = inputs.toDF("s")
      .select(col("s"), call_function("poly_hash", col("s")).as("h1"),
        call_function("poly_hash2", col("s")).as("h2"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) === refPolyHash(s, 31L, PolyHash.Mod), s"poly_hash('$s')")
      assert(r.getLong(2) === refPolyHash(s, 37L, PolyHash.Mod2), s"poly_hash2('$s')")
    }
  }

  // ------------------------------------------------------- sorted intersect

  test("sorted_intersect_count equals set intersection on random sorted arrays") {
    // skewed sizes on purpose: the kernel switches merge→probe past a
    // 32× size ratio, so the property must cross that boundary
    val arr = for {
      n <- Gen.oneOf(Gen.choose(0, 8), Gen.choose(0, 400))
      xs <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
    } yield xs.distinct.sorted
    val pairs = samples(Gen.zip(arr, arr), 200, seed = 7L)
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("sorted_intersect_count", col("a"), col("b")).as("n"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      assert(r.getInt(2) === a.toSet.intersect(b.toSet).size,
        s"intersect(${a.take(9)}, ${b.take(9)})")
    }
  }

  // ----------------------------------------------------------- float kernels

  test("float_dot equals the index-order double fold on random float arrays") {
    val f = Gen.choose(-8.0f, 8.0f)
    val pair = for {
      n <- Gen.choose(0, 64)
      a <- Gen.listOfN(n, f)
      b <- Gen.listOfN(n, f)
    } yield (a, b)
    val rows = samples(pair, 200, seed = 21L).toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("float_dot", col("a"), col("b")).as("d"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      // the model accumulates in the SAME index order — bitwise equality
      // is the claim (it is what makes oracle folds engine-identical)
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      assert(r.getDouble(2) === acc, s"float_dot over ${a.length} dims")
    }
  }

  // --------------------------------------------------------------- simhash

  private def refSimHash(toks: Seq[Long], width: Int): Long = {
    val votes = Array.fill(width)(0)
    toks.foreach { h =>
      (0 until width).foreach { j =>
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
      }
    }
    (0 until width).foldLeft(0L)((out, j) =>
      if (votes(j) > 0) out | (1L << j) else out)
  }

  test("simhash32/simhash60 match the majority-vote model on random token sets") {
    val tok60 = Gen.choose(0L, (1L << 60) - 1)
    val arr = for {
      n <- Gen.choose(0, 30)
      xs <- Gen.listOfN(n, tok60)
    } yield xs
    val rows = samples(arr, 200, seed = 31L).toDF("toks")
      .select(col("toks"),
        call_function("simhash32", col("toks")).as("h32"),
        call_function("simhash60", col("toks")).as("h60"))
      .collect()
    rows.foreach { r =>
      val toks = r.getSeq[Long](0)
      assert(r.getLong(1) === refSimHash(toks, 32), s"simhash32(${toks.take(4)})")
      assert(r.getLong(2) === refSimHash(toks, 60), s"simhash60(${toks.take(4)})")
    }
  }

  // ------------------------------------------------------------- BPE merge

  private def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("applyMerge equals the two-pointer model on adversarial binary sequences") {
    // alphabet {a, b} and merges drawn from its square maximize overlap
    // runs ("aaaa", "abab") — the cases where greedy-left semantics and
    // a naive regex replace diverge
    val sym = Gen.oneOf("a", "b")
    val seqGen = for {
      n <- Gen.choose(0, 12)
      xs <- Gen.listOfN(n, sym)
    } yield xs
    val caseGen = Gen.zip(seqGen, sym, sym)
    val cases = samples(caseGen, 250, seed = 13L)
    // group by merge pair: one Spark job per pair (4 jobs), whole batch each
    cases.groupBy { case (_, l, r) => (l, r) }.foreach { case ((l, r), cs) =>
      val got = cs.map(_._1).toDF("syms")
        .select(graft.operators.Bpe.applyMerge(col("syms"), l, r).as("m"))
        .collect().map(_.getSeq[String](0))
      got.zip(cs.map(_._1)).foreach { case (g, in) =>
        assert(g === refMerge(in, l, r), s"applyMerge($in, $l, $r)")
      }
    }
  }

  // ------------------------------------------------------------ unigram LM

  test("UnigramLm.score matches the exact-rational model on random corpora") {
    import graft.operators.UnigramLm
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val refDocs = samples(doc, 12, seed = 3L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val scoreDocs = samples(doc, 20, seed = 4L).zipWithIndex
      .map { case (t, i) => ((100 + i).toLong, t) }
    val lmCounts = refDocs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    val cTotal = lmCounts.values.sum
    val vSize = lmCounts.size.toLong
    val lm = UnigramLm.train(
      UnigramLm.termFreq(refDocs.toDF("doc_id", "text"), "doc_id", "text"))
    val got = UnigramLm.score(
        UnigramLm.termFreq(scoreDocs.toDF("doc_id", "text"), "doc_id", "text"),
        lm, "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    scoreDocs.foreach { case (id, text) =>
      val toks = text.split(" ").toSeq
      val lNum = toks.map(t => lmCounts.getOrElse(t, 0L) + 1L).sum
      val nOov = toks.count(t => !lmCounts.contains(t)).toLong
      val expMeanP = lNum.toDouble / (toks.length.toLong * (cTotal + vSize)).toDouble
      val r = got(id)
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_oov") === nOov)
      assert(r.getAs[Double]("mean_p") === expMeanP, s"mean_p(doc $id)")
      assert(r.getAs[Boolean]("keep") === (nOov * 2 <= toks.length))
    }
  }

  // ------------------------------------------------------------ cdc_bounds

  /** Per-window recompute — the O(L·w) model the rolling kernel must
    * reproduce exactly (shares no state-update code with CdcBounds). */
  private def refCdcBounds(s: String, w: Int, d: Long): Seq[Int] =
    (w to s.length).filter { i =>
      refPolyHash(s.substring(i - w, i), 31L, PolyHash.Mod) % d == 0
    }

  test("cdc_bounds matches the per-window recompute model on random " +
    "strings across window widths and divisors") {
    val gen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(32.toChar, 126.toChar),
        1 -> Gen.const('a'))) // runs of 'a' stress repeated windows
      w <- Gen.choose(1, 12)
      d <- Gen.oneOf(1L, 2L, 4L, 16L, 64L)
    } yield (cs.mkString, w, d)
    val inputs = samples(gen, 250, seed = 17L)
    // one whole-batch job per (w, d) combo present in the sample
    inputs.groupBy { case (_, w, d) => (w, d) }.foreach { case ((w, d), xs) =>
      val rows = xs.map(_._1).toDF("s")
        .select(col("s"),
          call_function("cdc_bounds", col("s"), lit(w), lit(d)).as("b"))
        .collect()
      rows.foreach { r =>
        val s = r.getString(0)
        val got = r.getSeq[Int](1).toList
        assert(got === refCdcBounds(s, w, d).toList,
          s"cdc_bounds('$s', w=$w, d=$d)")
      }
    }
  }
}
