package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Semantic invariants of the second curation batch (q83-q87) that the
  * oracle pass can't isolate: chunk coverage/overlap arithmetic, scrub
  * idempotence, mixture-weight conservation, PQ self-encoding.
  */
class CurationQ2Spec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def run(n: String) = Registry.byName(n).run(spark, sf)

  test("q83: fractions are consistent with the counters and bounded") {
    val rows = run("q83_repetition_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val topTf = r.getAs[Long]("top_tf")
      val topFrac = r.getAs[Double]("top_frac")
      assert(topFrac == topTf.toDouble / n.toDouble)
      assert(topFrac > 0.0 && topFrac <= 1.0)
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[Double]("distinct_ratio") <= 1.0)
    }
  }

  test("q84: chunks tile every document — stride coverage and len bounds") {
    val chunks = run("q84_token_chunks")
    val nDocs = graft.Tables.documents(spark, sf)
      .filter(size(graft.functions.TextFunctions.tokens(col("text"))) > 0).count()
    val byDoc = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), max(col("start")).as("max_start"),
        min(col("start")).as("min_start"), max(col("chunk_len")).as("max_len"))
      .collect()
    assert(byDoc.length == nDocs, "every non-empty doc produces chunks")
    byDoc.foreach { r =>
      assert(r.getAs[Int]("min_start") == 0, "first chunk starts at token 0")
      // consecutive starts differ by exactly the stride
      assert(r.getAs[Int]("max_start") == (r.getAs[Long]("n_chunks") - 1) * 24)
      assert(r.getAs[Int]("max_len") <= 32)
    }
  }

  test("q85: scrubbing removes every detected match for BOTH patterns") {
    // Rebuild the exact q85 chain (both injections, both scrub passes in
    // order) and assert the scrubbed text carries zero residual matches
    // of either pattern — the full-chain idempotence contract.
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "[0-9]{3}-[0-9]{4}"
    val out = run("q85_pii_scrub").collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getAs[Long]("n_phones") > 0),
      "fixture produced no phone injections — phone path untested")
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("text2", concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact admin"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(""),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise("")))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col("text2"), emailPat, "<EMAIL>"),
          phonePat, "<PHONE>"))
      .withColumn("residual",
        regexp_count(col("scrubbed"), lit(emailPat)) +
          regexp_count(col("scrubbed"), lit(phonePat)))
    assert(docs.agg(sum(col("residual"))).collect()(0).getLong(0) == 0L,
      "scrub left a matchable email or phone behind")
  }

  test("q86: shares sum to 1 and epochs-vs-weight arithmetic holds") {
    val rows = run("q86_domain_mixture").collect()
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      val e = r.getAs[Long]("epochs")
      assert(e == math.floor(w).toLong)
      val planned = r.getAs[Long]("planned_copies")
      val nDocs = r.getAs[Long]("n_docs")
      // planned copies land in [floor(w)*n, ceil(w)*n]
      assert(planned >= e * nDocs && planned <= (e + 1) * nDocs,
        s"${r.getAs[String]("source")}: planned=$planned outside [$e,${e + 1}]*$nDocs")
    }
  }

  test("q88: packing conserves every token and bins are contiguous per shard") {
    val rows = run("q88_sequence_packing").collect()
    val totalPacked = rows.map(_.getAs[Long]("n_tokens")).sum
    val totalCorpus = graft.Tables.documents(spark, sf)
      .select(sum(size(graft.functions.TextFunctions.tokens(col("text"))))
        .cast("long")).collect()(0).getLong(0)
    assert(totalPacked == totalCorpus, s"packing lost tokens: $totalPacked != $totalCorpus")
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Int]("shard")))
      .foreach { case (ls, rs) =>
        val byBin = rs.map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_tokens"))
          .sortBy(_._1)
        assert(byBin.head._1 == 0L, s"$ls: first bin is ${byBin.head._1}")
        // a doc spanning multiple full contexts overflows its bin
        // (fill > 1) and legitimately skips bins — a gap is only legal
        // after a bin that overflowed by at least the gap's width
        byBin.zip(byBin.tail).foreach { case ((a, aTok), (b, _)) =>
          assert(b == a + 1 || aTok > (b - a) * 256L,
            s"$ls: gap $a→$b not explained by overflow (bin $a holds $aTok tokens)")
        }
      }
  }

  test("q87: ADC self-distance ranks a codebook vector first for its own probe") {
    // A probe IS a corpus vector, and ADC distance of a vector to itself
    // uses its own codes — the minimum possible ADC value for that probe.
    val rows = run("q87_pq_adc_ann").collect()
    val byProbe = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byProbe.keySet == (16L until 24L).toSet)
    byProbe.foreach { case (q, rs) =>
      val top = rs.minBy(_.getAs[Int]("rk"))
      assert(top.getAs[Long]("vec_id") == q,
        s"probe $q: self not ranked first (got ${top.getAs[Long]("vec_id")})")
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length))
    }
  }
}
