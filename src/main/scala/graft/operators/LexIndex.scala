package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent inverted index: the storage half of lexical retrieval —
  * [[VecIndex]]'s counterpart for BM25.
  *
  * q111/q113 demonstrate the SEARCH plan with the tf relation built
  * inline; at fleet scale retrieval does not re-shuffle a 100 TB corpus
  * per query batch — the postings live in storage, partitioned by a
  * term bucket, and every search reads only its query terms' buckets
  * through partition pruning at the file listing (the VecIndex rule).
  *
  * Layout:
  * {{{
  *   path/postings/tb=N/part-*.parquet  // (term, doc_id, tf, dl, df)
  *   path/stats/part-*.parquet          // 1 row (n_docs, t_total, avgdl_s)
  * }}}
  * Document length and document frequency are DENORMALIZED into the
  * posting rows — df is constant per term and dl per document, so
  * search needs no doc-length join and no df dimension: one pruned
  * scan, one broadcast probe join, one per-query top-k window. The
  * denormalization is the classic posting-list trade: ~2 extra longs
  * per posting buys a search plan whose only corpus-sized input is the
  * pruned posting scan itself.
  */
object LexIndex {

  /** Term-bucket count. Search cost per query term ≈ 1/Buckets of the
    * postings; more buckets prune harder but make more, smaller
    * partition directories. */
  val Buckets = 64L

  private def postingsDir(path: String) = s"$path/postings"
  private def statsDir(path: String) = s"$path/stats"

  private def tb(term: org.apache.spark.sql.Column) =
    pmod(graft.functions.TextFunctions.strHash(term), lit(Buckets))

  /** Build from a (doc_id, term, tf) relation: derive dl/df/stats,
    * denormalize into postings, persist partitioned by term bucket.
    * Three aggregations over tf (doc-grain, term-grain, 1-row) and one
    * partitioned write — no collect, no corpus-sized driver state. */
  def build(tf: DataFrame, path: String): Unit = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val st = Bm25.stats(tf)
    tf.join(dl, Seq("doc_id"))
      .join(dfreq, Seq("term"))
      .withColumn("tb", tb(col("term")))
      .write.mode("overwrite").partitionBy("tb").parquet(postingsDir(path))
    st.write.mode("overwrite").parquet(statsDir(path))
  }

  /** The pinned corpus statistics the index was built with. */
  def stats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(statsDir(path))

  /** Incremental maintenance: fold a DELTA tf relation (NEW documents
    * only — ids must be disjoint from the indexed corpus) into the
    * persisted index, touching only the delta's term buckets. The move
    * is exact, not approximate: a term's bucket is deterministic, so
    * every posting whose df changes lives in a touched bucket — those
    * buckets are rebuilt (old rows ∪ delta rows, df recounted over the
    * union), untouched buckets keep their rows AND their df, and the
    * 1-row stats table advances by integer monoid sums. Daily cost is
    * ∝ touched buckets + delta, never the full corpus;
    * `merge(build(A), tf(B)) ≡ build(A ∪ B)` row-for-row
    * (LexIndexSpec), the same exact-incremental discipline as
    * `UnigramLm.merge` and `Curation.curateIncremental`. Bucket swap
    * goes through a temp dir + rename (the VecIndex.compact pattern) —
    * never an overwrite of a path being read. */
  def merge(spark: SparkSession, path: String, deltaTf: DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val touched = deltaTf.select(tb(col("term")).as("tb")).distinct()
      .collect().map(_.getLong(0))
    if (touched.isEmpty) return
    val oldPost = spark.read.parquet(postingsDir(path))
      .filter(col("tb").isin(touched.toIndexedSeq: _*))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val deltaDl = deltaTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val unioned = oldPost.unionByName(
      deltaTf.join(deltaDl, Seq("doc_id"))
        .select(col("term"), col("doc_id"), col("tf"), col("dl")))
    val dfreq = unioned.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val post = new Path(postingsDir(path))
    val fs = post.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path/__merging")
    fs.delete(tmp, true) // debris from an aborted earlier run
    unioned.join(dfreq, Seq("term")).withColumn("tb", tb(col("term")))
      .write.mode("overwrite").partitionBy("tb").parquet(tmp.toString)
    val oldSt = stats(spark, path).select(col("n_docs"), col("t_total")).head()
    val dSt = deltaDl.agg(count(lit(1)).as("n"), sum(col("dl")).as("t")).head()
    val nDocs = oldSt.getLong(0) + dSt.getLong(0)
    val tTotal = oldSt.getLong(1) + dSt.getLong(1)
    val stTmp = new Path(s"$path/__merging_stats")
    fs.delete(stTmp, true)
    spark.range(1)
      .select(lit(nDocs).as("n_docs"), lit(tTotal).as("t_total"),
        lit(tTotal * Bm25.Scale / nDocs).as("avgdl_s"))
      .write.mode("overwrite").parquet(stTmp.toString)
    for (b <- touched) {
      val dst = new Path(post, s"tb=$b")
      fs.delete(dst, true) // absent for brand-new buckets — fine
      require(fs.rename(new Path(tmp, s"tb=$b"), dst),
        s"bucket swap failed: $tmp/tb=$b -> $dst")
    }
    fs.delete(tmp, true)
    val stDir = new Path(statsDir(path))
    fs.delete(stDir, true)
    require(fs.rename(stTmp, stDir), s"stats swap failed: $stTmp -> $stDir")
  }

  /** BM25 top-k over the persisted index. `qterms` is (q_id, term) —
    * workload-sized. The literal bucket IN-list prunes the posting scan
    * at file listing (asserted by LexIndexSpec); scoring is
    * [[Bm25.scoreExpr]] — identical arithmetic to the inline and
    * streaming forms. */
  def search(spark: SparkSession, path: String, qterms: DataFrame,
             k: Int): DataFrame = {
    val buckets = qterms.select(tb(col("term")).as("tb")).distinct()
      .collect().map(_.getLong(0))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("bm25_s").desc, col("doc_id").asc)
    spark.read.parquet(postingsDir(path))
      .filter(col("tb").isin(buckets.toIndexedSeq: _*))
      .join(broadcast(qterms.select(col("q_id"), col("term"))), Seq("term"))
      .crossJoin(broadcast(stats(spark, path)))
      .withColumn("sc", Bm25.scoreExpr(col("tf"), col("dl"), col("df"),
        col("n_docs"), col("avgdl_s")))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("sc")).as("bm25_s"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("doc_id"), col("n_hit"), col("bm25_s"))
  }
}
