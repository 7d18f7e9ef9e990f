package graft.queries

import graft.SparkSpecBase

/** Physical-plan contracts: the properties that make the battery hold at
  * 100 TB are asserted here, not just described — filter pushdown reaches
  * the parquet scans, projection pruning trims fact-table reads, dimension
  * joins broadcast, arithmetic stays inside whole-stage codegen, and no
  * query ever plans a non-broadcast cartesian product.
  */
class PlanContractSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("every registry query plans without a CartesianProduct") {
    Registry.all.foreach { q =>
      val p = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} planned a shuffle cartesian product:\n$p")
    }
  }

  test("date-range predicate is pushed into the parquet scan (q17)") {
    val p = plan("q17_set_difference")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
  }

  test("fact-table scan is column-pruned (q01 reads no comment/address cols)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_comment"), "q01 scan failed to prune l_comment:\n" + p)
  }

  test("superquery dimension joins broadcast (q02)") {
    val p = plan("q02_superquery_union")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("LSH pipeline joins are all broadcast — shuffles only for aggregation (q32)") {
    val p = plan("q32_lsh_neardup_pairs")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "q32 fell back to a shuffle join — the pair stream must not shuffle:\n" + p)
  }

  test("similarity kernels stay inside whole-stage codegen (q34, q55)") {
    Seq("q34_cosine_topk", "q55_ivf_ann").foreach { n =>
      val df = Registry.byName(n).run(spark, sf)
      df.collect() // materialize so AQE finalizes stages (codegen is inserted per stage)
      val exec0 = df.queryExecution.executedPlan
      // AQE wraps the physical plan in a node whose input is not a child —
      // unwrap so tree traversal sees the real operators
      val exec = exec0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val p = exec.toString
      assert(p.contains("float_dot"), s"$n lost the native dot kernel:\n$p")
      // "*(n)" prefixes mark WholeStageCodegen stages in the simple string
      assert(p.contains("*("), s"$n has no codegen stage:\n$p")
    }
  }

  test("low-cardinality-key top-k windows pre-prune map-side (q74)") {
    // q74 partitions its rank window by `lang` (a handful of values). That
    // is only scale-safe because InferWindowGroupLimit plants a Partial
    // WindowGroupLimit below the exchange, so each input partition ships
    // at most k rows per language instead of the whole corpus. If a future
    // edit breaks the rank-filter shape this rule keys on, the window
    // silently degrades to moving the corpus through n_lang partitions.
    val p = plan("q74_lang_sample")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"q74 lost the partial window group limit:\n$p")
  }

  test("argmin/top-k windows pre-prune map-side (q55, q87)") {
    // q55's IVF assignment window (row_number over vec filtered to
    // rn = 1) and q87's per-probe ADC top-k window are only scale-safe
    // because InferWindowGroupLimit plants a Partial WindowGroupLimit
    // below the exchange — each input partition ships ≤ k rows per
    // window key instead of the full fan-out. (q87's former argmin
    // ENCODE window is gone entirely: pq_encode runs map-side.)
    // Same mechanism q74 relies on for its language top-k.
    Seq("q55_ivf_ann", "q87_pq_adc_ann").foreach { n =>
      val p = plan(n)
      assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
        s"$n lost the partial window group limit below the top-k exchange:\n$p")
    }
  }

  test("the PQ family plans carry the map-side codegen kernels (q87)") {
    // The join+window PQ encode was the engine's worst measured growth
    // row (2.6× at 10×). The kernel plan must keep: pq_encode over the
    // raw scan (no subspace explode of the corpus), pq_adc under the
    // top-k window, and NO row_number at (vec, subspace) grain.
    val p = plan("q87_pq_adc_ann")
    assert(p.contains("pq_encode") && p.contains("pq_adc"),
      s"q87 lost the PQ codegen kernels:\n$p")
    assert(!p.contains("windowspecdefinition(vec_id"),
      s"q87 regrew an encode-side window at (vec, subspace) grain:\n$p")
  }

  test("IVF-PQ search joins on the cell id via broadcast only (q95)") {
    // The production ANN shape: the corpus side is one kernel scan
    // (coarse assign + residual + codes, all map-side); the probe-cell
    // table broadcasts into the cell-keyed join. A SortMergeJoin here
    // would shuffle the full code table per query batch; an encode-side
    // window would re-grow the ×k blowup q87 shed.
    val p = plan("q95_ivfpq_ann")
    assert(p.contains("pq_encode") && p.contains("float_sub") &&
      p.contains("pq_adc"), s"q95 lost the kernel plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"q95 shuffled the code table instead of broadcasting probe cells:\n$p")
    assert(!p.contains("windowspecdefinition(vec_id"),
      s"q95 has an encode-side window at corpus grain:\n$p")
  }

  test("partition-less windows only ever run over pre-reduced inputs") {
    // A Window with no partitionSpec moves its whole input to ONE partition.
    // That is only acceptable when the input has already been reduced by an
    // aggregation (daily totals, chunk stats, per-bucket islands) — bounded
    // data, documented contract (q12/q14/q51 + the Islands chain merge).
    // A partition-less window directly over a scan is a 100 TB scale-killer
    // (round-1 q11) and fails this test.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    Registry.all.foreach { q =>
      val lp = q.run(spark, sf).queryExecution.optimizedPlan
      lp.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          val reduced = w.child.collectFirst {
            case a: Aggregate => a: Any
            case l: GlobalLimit => l: Any // distributed top-k (q49)
          }.isDefined
          assert(reduced,
            s"${q.name}: partition-less window over un-reduced input:\n$lp")
        case _ => ()
      }
    }
  }

  test("operator entry points obey the window/cartesian contracts") {
    // The registry sweep above misses library operators that aren't
    // registry queries (the round-3 KMeans init scale-killer was invisible
    // to it). Audit their un-checkpointed plans directly.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    import org.apache.spark.sql.functions._
    import graft.operators.{DedupGroups, KMeans, PQ, SkewJoin}
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 1)
    val entries: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "KMeans.initCentroids" ->
        KMeans.initCentroids(KMeans.prep(emb, "vec_id", "embedding"), 4),
      "KMeans.assign" -> KMeans.assign(emb, "vec_id", "embedding", cents),
      "PQ.initCodebookIds" -> PQ.initCodebookIds(
        PQ.subspaces(emb, "vec_id", "embedding", m = 8, dsub = 8), 16),
      "DedupGroups.keepBest" -> DedupGroups.keepBest(
        docs.withColumn("qual", length(col("text")).cast("double")),
        "doc_id", "qual", pairs, "doc_a", "doc_b"),
      "SkewJoin.saltedEquiJoin" -> SkewJoin.saltedEquiJoin(
        spark.read.parquet(s"$sf/lineitem.parquet")
          .withColumn("k", col("l_suppkey") % 3),
        spark.read.parquet(s"$sf/nation.parquet")
          .select((col("n_nationkey") % 3).as("k"), col("n_name")),
        Seq("k"), col("l_orderkey"), nSalts = 4))
    entries.foreach { case (name, df) =>
      val lp = df.queryExecution.optimizedPlan
      lp.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          val reduced = w.child.collectFirst {
            case a: Aggregate => a: Any
            case l: GlobalLimit => l: Any
          }.isDefined
          assert(reduced, s"$name: partition-less window over un-reduced input:\n$lp")
        case _ => ()
      }
      assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
        s"$name planned a cartesian product")
    }
  }

  test("q32's broadcast→shuffle join swap is result-identical (the 100 TB fallback)") {
    // The registered q32 is UNHINTED: Catalyst broadcasts below the
    // threshold (the small-SF contract asserted above) and swaps to the
    // co-located shuffle join past it — the 100 TB behavior. Pin both
    // ends of the swap: the forced-broadcast form (hinted = true, the
    // explicit contract plan) and the forced-shuffle form (threshold -1)
    // must each produce exactly the registered pair set.
    val registeredRows = Registry.byName("q32_lsh_neardup_pairs")
      .run(spark, sf).collect().map(_.toString).sorted
    val forced = SimilarityQ.lshNearDupPairs(spark, sf, hinted = true)
    val forcedRows = forced.collect().map(_.toString).sorted
    assert(forced.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "hinted form did not broadcast")
    assert(forcedRows.sameElements(registeredRows),
      "pair set changed under forced-broadcast planning")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      spark.catalog.clearCache() // drop cached signatures planned pre-swap
      val df = SimilarityQ.lshNearDupPairs(spark, sf, hinted = false)
      val shuffleRows = df.collect().map(_.toString).sorted
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"fallback plan still broadcasts:\n$p")
      assert(shuffleRows.sameElements(registeredRows),
        "pair set changed under shuffle-join planning")
    } finally {
      spark.conf.set(key, prev)
      spark.catalog.clearCache()
    }
  }

  test("wide-simhash band join broadcasts; no shuffle on the pair stream (q78)") {
    val p = plan("q78_simhash60_neardup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "q78 fell back to a shuffle join — the band-bucket probe side must broadcast:\n" + p)
  }

  test("multi-probe IVF search joins broadcast the probe cell list (q80)") {
    val p = plan("q80_ivf_multiprobe")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bilinear corner lookups broadcast; probes never shuffle (q64)") {
    val p = plan("q64_bilinear_gain")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "grid corner joins must broadcast:\n" + p)
  }

  test("flagship aggregation runs partial (map-side) aggregation (q01)") {
    val p = plan("q01_pricing_summary")
    // two HashAggregate levels around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("chunk-rewrite first-occurrence is a partial-aggregatable min, not a window (q94)") {
    // The deliberate design point of q94: first-global-occurrence per
    // chunk_hash as min(packed (doc_id, pos)) — map-side combine
    // collapses each partition's occurrences of a boilerplate chunk to
    // ONE row before the shuffle. The window formulation would put a
    // chunk repeated in 10⁹ documents into one window partition.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = Registry.byName("q94_chunk_rewrite").run(spark, sf)
      .queryExecution.optimizedPlan
    assert(!lp.exists(_.isInstanceOf[LWindow]),
      "q94 must not contain any Window — first-occurrence is an aggregation")
    val p = plan("q94_chunk_rewrite")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"q94 lost the partial (map-side) first-occurrence aggregation:\n$p")
  }

  test("unigram-LM vocabulary dimension broadcasts; corpus shuffles only at tf grain (q96)") {
    // The LM (term → count) is vocabulary-sized — a derived dimension.
    // If it ever plans as a SortMergeJoin the (doc, term) relation
    // re-shuffles on term, a second corpus-sized exchange for a
    // dimension lookup.
    val p = plan("q96_unigram_lm")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"q96 shuffled the corpus to join the vocabulary dimension:\n$p")
  }

  test("semantic decontamination is map-side over a broadcast bench array (q98)") {
    // q70's contract in embedding space: the benchmark collapses to one
    // broadcast row; the corpus side must not shuffle AT ALL before the
    // final sort — no join of any kind on a corpus-grain key.
    val p = plan("q98_semantic_decontam")
    assert(p.contains("float_dot"), s"q98 lost the native dot kernel:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q98 shuffled the corpus for the benchmark lookup:\n$p")
  }

  test("BPE pair counting is aggregation-only: partial combines, no window (q97)") {
    // The pair round must stay a pair-grain count with map-side partial
    // aggregation (word-freq agg + pair agg = two partial/final pairs) —
    // a window formulation would move the vocab through rank partitions.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = Registry.byName("q97_bpe_pairs").run(spark, sf)
      .queryExecution.optimizedPlan
    assert(!lp.exists(_.isInstanceOf[LWindow]),
      "q97 must not contain any Window — pair stats are aggregations")
    val p = plan("q97_bpe_pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"q97 lost a partial (map-side) aggregation level:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q97 top-k must plan TakeOrdered, not a global sort:\n$p")
  }

  test("joint curation keeps both stage contracts composed (q100)") {
    // Composition must not degrade either stage: the LM dimension and
    // the bench array stay broadcast, and the only shuffle joins allowed
    // are on the doc-grain verdict key.
    val p = plan("q100_joint_curation")
    assert(p.contains("float_dot"), s"q100 lost the native dot kernel:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("cluster-sample windows pre-prune map-side (q99)") {
    // Both windows (assignment argmin, per-cell rank) key on a handful
    // of cells / corpus-grain ids — scale-safe only via the Partial
    // WindowGroupLimit (the q74 mechanism).
    val p = plan("q99_cluster_sample")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"q99 lost the partial window group limit:\n$p")
  }

  test("sealed-history rows are pure reads of the sealed store (q139/q140)") {
    // The point of sealing: the export and the diff never re-run
    // curation or touch corpus text. Structural check over the
    // optimized plan's file relations (string plans truncate long
    // FileScan paths, which could hide a regression).
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scanRoots(name: String): Seq[String] =
      Registry.byName(name).run(spark, sf).queryExecution.optimizedPlan
        .collect { case l: LogicalRelation => l.relation }
        .collect { case h: HadoopFsRelation =>
          h.location.rootPaths.map(_.toString) }
        .flatten
    val r139 = scanRoots("q139_snapshot_export")
    assert(r139.size == 1 && r139.forall(_.contains("/snap/v=1")),
      s"q139 is not one sealed-store scan: $r139")
    val r140 = scanRoots("q140_snapshot_diff")
    assert(r140.size == 2 && r140.forall(_.contains("/snap/v=")),
      s"q140 is not two sealed-store scans: $r140")
    (r139 ++ r140).foreach(p =>
      assert(!p.contains("documents") && !p.contains("testdata"),
        s"sealed-history row scans corpus data: $p"))
  }

  test("delta-composed lex search keeps the bucket-pruned scan + broadcast candidate build") {
    // LexIndexDeltaSpec pins VALUE equality of the composed search;
    // this pins its PLAN: a live stream delta must not regress the
    // bulk side to a full-index scan (the path-list bucket pruning is
    // the reason searches never touch unprobed postings), the delta
    // side must compose off the view's one materialized relation, and
    // no join over unreduced rows may shuffle.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions._
    import graft.operators.{LexIndex, UnigramLm}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val d = docs.filter(col("doc_id") % 3 === 0)
    val live = tempDir("plan_lexdelta")
    LexIndex.build(UnigramLm.termFreq(a, "doc_id", "text"), live)
    LexIndex.appendStreamDeltaBatch(spark, live, d, 0L,
      LexIndex.deltaGen(spark, live))
    val qterms = UnigramLm.termFreq(docs.limit(3), "doc_id", "text")
      .select(col("term")).distinct().orderBy(col("term")).limit(2)
      .withColumn("q_id", lit(1L)).select(col("q_id"), col("term"))
      .localCheckpoint(true)
    val qe = LexIndex.pinned(spark, live).search(qterms, 5).queryExecution
    // bulk side: the file scans under buckets/ are exactly a per-bucket
    // path list — ≤ one bucket per distinct query term, never the index
    val bucketRoots = qe.sparkPlan.collect { case f: FileSourceScanExec =>
      f.relation.location.rootPaths.map(_.toString) }.flatten
      .filter(_.contains("/buckets/"))
    assert(bucketRoots.nonEmpty && bucketRoots.forall(_.contains("/tb=")),
      s"bulk side lost the bucket path-list read: $bucketRoots")
    assert(bucketRoots.map(_.replaceAll(".*tb=", "")).distinct.size <= 2,
      s"composed search scanned more buckets than its query terms: $bucketRoots")
    // delta side: one materialized relation (the pinned view's local
    // checkpoint), not a re-read of the b= files
    val s = qe.executedPlan.toString
    assert(s.contains("ExistingRDD") || s.contains("LocalTableScan"),
      "delta side is not composed off the materialized view:\n" + s)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastHashJoin"),
      "candidate build lost its broadcast joins:\n" + s)
    // any shuffle join (the tiny per-term df full-outer compose) must
    // run over PRE-REDUCED term-grain aggregates, never raw
    // posting/delta rows
    qe.sparkPlan.collect { case j: SortMergeJoinExec => j }.foreach { j =>
      j.children.foreach { side =>
        val reduced = side.collectFirst {
          case h: HashAggregateExec => h: Any
          case o: ObjectHashAggregateExec => o: Any
        }.isDefined
        assert(reduced,
          s"shuffle join over unreduced rows in the composed search:\n$j")
      }
    }
  }
}
