package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Product-quantization codebook trainer — the "train" half of the
  * PQ-ADC path (q87 scores against derived codebooks; q90 runs this
  * trainer). Per-subspace Lloyd under L2, in ONE DAG for all subspaces:
  * a driver loop over the m subspaces would launch m independent Lloyd
  * jobs, but keying every stage by the subspace index j trains all
  * codebooks simultaneously — assignment windows on (id, j), the mean
  * update shuffles on (j, cid, dim) — so the round count, not m, is the
  * number of passes over the data.
  *
  * Deterministic by the KMeans conventions: init = the k lowest-id
  * sub-vectors per subspace (every id appears in every subspace, so the
  * k lowest GLOBAL ids are the k lowest per subspace — one distributed
  * TakeOrdered, no corpus-wide window), L2 ties break toward the lowest
  * cid, per-dimension means cast to float32 (drowning the last-ulp
  * jitter of distributed AVG, exactly the `KMeans.lloyd` caveat). Cells
  * that lose every member simply drop out of the re-estimate — the same
  * convention on any engine re-deriving the rounds.
  */
object PQ {

  /** (id, vec) → (id, j, sub, ss): the m×dsub subspace decomposition
    * with the sub-vector self-dot every L2 distance reuses. */
  def subspaces(emb: DataFrame, idCol: String, vecCol: String,
                m: Int, dsub: Int): DataFrame =
    emb
      .select(col(idCol).as("id"), explode(sequence(lit(0), lit(m - 1))).as("j"),
        col(vecCol).as("__vec"))
      .withColumn("sub", slice(col("__vec"), col("j") * dsub + 1, lit(dsub)))
      .drop("__vec")
      .withColumn("ss", callDot(col("sub"), col("sub")))

  /** @param sub   output of [[subspaces]] (id, j, sub, ss)
    * @param k     centroids per subspace
    * @param iters Lloyd rounds (fixed count, as in `KMeans.lloyd`)
    * @return trained codebooks (j, cid, cent: array<float>, cc = ‖cent‖²) */
  def trainCodebooks(sub: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    // NOT spread before the checkpoint (unlike KMeans.lloyd): a PQ
    // codebook's per-round fan-out is k_sub·dsub per (id, j) row — far
    // smaller than a coarse quantizer's n·k — and an A/B measured the
    // explicit shuffle of the exploded subspace relation as pure cost
    // (q90 2.11 → 3.07 s with it)
    val vecs = sub.select(col("id"), col("j"), col("sub"), col("ss")).localCheckpoint()
    val initIds = initCodebookIds(vecs, k)
    var cents = vecs.join(broadcast(initIds), Seq("id"))
      .select(col("j"), col("cid"), col("sub").as("cent"), col("ss").as("cc"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      // map-side argmin via the pq_encode codegen kernel at m = 1
      // (round 13, guide §2.4 + the expressions/codegen rule): the
      // per-j codebook collapses to a broadcast row of cid-sorted
      // single-subspace nested arrays and each (id, j) row encodes
      // against it alone — the former broadcast join + row_number
      // window paid a local sort of n·m·k rows plus an (id, j)-keyed
      // exchange per Lloyd round for an argmin no row needs its
      // neighbours for. pq_encode's distance is the SAME expanded
      // d2Expr tree (self-dot first, left-to-right dots) and its
      // tie-break (earliest position = lowest cid in a cid-sorted
      // list, NaN loses) is the window's (d2 asc, cid asc) SortOrder.
      val cellArr = cents.groupBy(col("j"))
        .agg(array_sort(collect_list(struct(col("cid"), col("cent"), col("cc"))))
          .as("__cells"))
        .select(col("j"),
          transform(col("__cells"), c => c.getField("cid")).as("__cids"),
          array(transform(col("__cells"), c => c.getField("cent"))).as("__cents1"),
          array(transform(col("__cells"), c => c.getField("cc"))).as("__ccs1"))
      val pos = element_at(call_function("pq_encode",
        col("sub"), col("__cents1"), col("__ccs1")), 1)
      val assigned = vecs.join(broadcast(cellArr), Seq("j"))
        .select(col("j"),
          element_at(col("__cids"), pos + 1).as("cid"), col("sub"))
        // pq_encode yields null for ragged/null-element sub-vectors; a
        // null cid must not flow into the mean update as a spurious
        // (j, null) codebook row that the next round's broadcast arrays
        // would carry (ADVICE r13 — the former window plan assigned
        // such rows to the lowest cid; neither row kind exists in valid
        // training input, so this is a guard, not a semantics change)
        .filter(col("cid").isNotNull)
      val means = assigned
        .select(col("j"), col("cid"), posexplode(col("sub")).as(Seq("d", "x")))
        .groupBy(col("j"), col("cid"), col("d"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("j"), col("cid"))
        .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
        .select(col("j"), col("cid"),
          transform(col("dm"), e => e.getField("m").cast(FloatType)).as("cent"))
      cents = means
        .withColumn("cc", callDot(col("cent"), col("cent")))
        .localCheckpoint()
    }
    cents
  }

  /** Init = the k lowest GLOBAL ids with their cell numbers. The
    * orderBy(..).limit(k) plans as a distributed TakeOrdered and the
    * partition-less numbering window runs over the already-reduced k
    * rows only (the KMeans.initCentroids discipline). Exposed
    * (package-private) so PlanContractSpec can audit the
    * un-checkpointed plan. */
  private[graft] def initCodebookIds(vecs: DataFrame, k: Int): DataFrame =
    vecs.select(col("id")).distinct()
      .orderBy(col("id").asc).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("id").asc)) - 1).cast("int"))

  /** ‖x − c‖² expanded as (‖x‖² − 2⟨x,c⟩) + ‖c‖² — the exact expression
    * tree (parenthesization included) q87's oracle spells, so trained
    * and derived codebooks score through ONE arithmetic definition. */
  def d2Expr(ss: Column, sub: Column, cent: Column, cc: Column): Column =
    (ss - lit(2.0) * callDot(sub, cent)) + cc

  /** Collapse a codebook relation (j, c_id, cent, cc) into ONE broadcast
    * row of j-ordered, cid-ordered nested arrays — the shape the pq_*
    * codegen kernels consume. Stays in the DAG (two aggregations over
    * the codebook-sized relation), no collect. */
  def codebookRow(cb: DataFrame): DataFrame =
    cb.groupBy(col("j"))
      .agg(array_sort(collect_list(struct(col("c_id"), col("cent"), col("cc"))))
        .as("cells"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("j"), col("cells")))).as("js"))
      .select(
        transform(col("js"), x =>
          transform(x.getField("cells"), c => c.getField("cent"))).as("cents"),
        transform(col("js"), x =>
          transform(x.getField("cells"), c => c.getField("cc"))).as("ccs"))

  private def callDot(a: Column, b: Column): Column =
    call_function("float_dot", a, b)
}
