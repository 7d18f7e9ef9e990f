package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import scala.util.Random

/** The PQ kernel family (pq_encode / pq_dtab / pq_adc / subspace_l2)
  * must reproduce the join+window plan it replaced bitwise: same
  * expanded-form d2 tree, same lowest-cid tie-break, same ascending-j
  * ADC fold — verified here against Column-algebra reference
  * implementations built from float_dot/slice/aggregate. */
class PqOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val m = 4
  private val dsub = 4
  private val k = 5
  private val rng = new Random(7)

  private def randVec(n: Int): Array[Float] =
    Array.fill(n)(rng.nextFloat() * 2 - 1)

  // one codebook row: cents[j][i][d], ccs[j][i] = ‖c‖² left-to-right
  private val cb: Seq[Seq[Array[Float]]] =
    Seq.fill(m)(Seq.fill(k)(randVec(dsub)))
  private def selfDot(a: Array[Float]): Double = {
    var s = 0.0; a.foreach(x => s += x.toDouble * x.toDouble); s
  }
  private val ccs: Seq[Seq[Double]] = cb.map(_.map(selfDot))

  private def withCb(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("cents", typedlit(cb)).withColumn("ccs", typedlit(ccs))

  /** Reference argmin per subspace in plain Scala (lowest index wins
    * ties) against the identical double arithmetic. */
  private def refEncode(v: Array[Float]): Seq[Int] =
    (0 until m).map { j =>
      val sub = v.slice(j * dsub, (j + 1) * dsub)
      val ss = selfDot(sub)
      val d2s = (0 until k).map { i =>
        var dot = 0.0
        (0 until dsub).foreach(d => dot += sub(d).toDouble * cb(j)(i)(d).toDouble)
        (ss - 2.0 * dot) + ccs(j)(i)
      }
      d2s.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }

  test("pq_encode matches the reference argmin, positions in cid order") {
    val vecs = (0 until 200).map(i => (i.toLong, randVec(m * dsub)))
    val got = withCb(vecs.toDF("vec_id", "embedding"))
      .select($"vec_id",
        call_function("pq_encode", $"embedding", $"cents", $"ccs").as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refEncode(v), s"vec $id")
    }
  }

  test("pq_encode tie-break keeps the earliest (lowest-cid) cell") {
    // duplicate centroid in positions 1 and 3 → exact d2 tie → position 1
    val dup = cb.map(cells => cells.updated(3, cells(1)))
    val dupCc = dup.map(_.map(selfDot))
    val v = dup(0)(1) ++ dup(1)(1) ++ dup(2)(1) ++ dup(3)(1)
    val codes = Seq((1L, v)).toDF("vec_id", "embedding")
      .withColumn("cents", typedlit(dup)).withColumn("ccs", typedlit(dupCc))
      .select(call_function("pq_encode", $"embedding", $"cents", $"ccs"))
      .as[Seq[Int]].head()
    assert(codes == Seq(1, 1, 1, 1))
  }

  test("pq_adc is the ascending-j fold of dtab lookups, bitwise vs HOF") {
    val vecs = (0 until 100).map(i => (i.toLong, randVec(m * dsub)))
    val probes = (0 until 4).map(i => (1000L + i, randVec(m * dsub)))
    val enc = withCb(vecs.toDF("vec_id", "embedding"))
      .select($"vec_id",
        call_function("pq_encode", $"embedding", $"cents", $"ccs").as("codes"))
    val dt = withCb(probes.toDF("q_id", "q_vec"))
      .select($"q_id",
        call_function("pq_dtab", $"q_vec", $"cents", $"ccs").as("dtab"))
    val rows = enc.crossJoin(dt)
      .select(
        call_function("pq_adc", $"codes", $"dtab").as("native"),
        expr("aggregate(zip_with(codes, dtab, (c, row) -> row[c]), " +
          "cast(0.0 as double), (acc, x) -> acc + x)").as("fold"))
      .as[(Double, Double)].collect()
    assert(rows.length == 400)
    rows.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(f))
    }
  }

  test("pq_dtab entries equal the expanded-form d2 of float_dot algebra") {
    val v = randVec(m * dsub)
    val dtab = withCb(Seq((1L, v)).toDF("q_id", "q_vec"))
      .select(call_function("pq_dtab", $"q_vec", $"cents", $"ccs"))
      .as[Seq[Seq[Double]]].head()
    for (j <- 0 until m; i <- 0 until k) {
      val sub = v.slice(j * dsub, (j + 1) * dsub)
      var dot = 0.0
      (0 until dsub).foreach(d => dot += sub(d).toDouble * cb(j)(i)(d).toDouble)
      val want = (selfDot(sub) - 2.0 * dot) + ccs(j)(i)
      assert(java.lang.Double.doubleToLongBits(dtab(j)(i)) ==
        java.lang.Double.doubleToLongBits(want), s"j=$j i=$i")
    }
  }

  test("subspace_l2 equals the ascending-j fold of per-subspace expanded d2") {
    val pairs = (0 until 100).map(i =>
      (i.toLong, randVec(m * dsub), randVec(m * dsub)))
    val got = pairs.toDF("id", "a", "b")
      .select($"id",
        call_function("subspace_l2", $"a", $"b", lit(m)).as("native"))
      .as[(Long, Double)].collect().toMap
    pairs.foreach { case (id, a, b) =>
      var acc = 0.0
      (0 until m).foreach { j =>
        val sa = a.slice(j * dsub, (j + 1) * dsub)
        val sb = b.slice(j * dsub, (j + 1) * dsub)
        var dot = 0.0
        (0 until dsub).foreach(d => dot += sa(d).toDouble * sb(d).toDouble)
        acc += (selfDot(sa) - 2.0 * dot) + selfDot(sb)
      }
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(acc), s"pair $id")
    }
  }

  test("float_sub is bitwise equal to the HOF zip_with difference") {
    val rows = (0 until 200).map { i =>
      val n = 1 + rng.nextInt(64)
      (i.toLong, randVec(n), randVec(n))
    }
    val got = rows.toDF("id", "a", "b")
      .select($"id",
        call_function("float_sub", $"a", $"b").as("native"),
        expr("zip_with(a, b, (x, y) -> cast(x - y as float))").as("fold"))
      .as[(Long, Seq[Float], Seq[Float])].collect()
    got.foreach { case (id, n, f) =>
      assert(n.length == f.length, s"row $id")
      n.zip(f).foreach { case (x, y) =>
        assert(java.lang.Float.floatToIntBits(x) ==
          java.lang.Float.floatToIntBits(y), s"row $id")
      }
    }
    // mismatched lengths → null
    val mism = Seq((1L, Array(1.0f), Array(1.0f, 2.0f))).toDF("id", "a", "b")
      .select(call_function("float_sub", $"a", $"b")).collect()
    assert(mism.head.isNullAt(0))
  }

  test("ragged/invalid inputs yield null, not wrong answers") {
    val bad = Seq(
      // vec length not m×dsub (and not divisible by the subspace_l2 m)
      (1L, randVec(m * dsub - 1))).toDF("vec_id", "embedding")
    val out = withCb(bad)
      .select(
        call_function("pq_encode", $"embedding", $"cents", $"ccs").as("e"),
        call_function("pq_dtab", $"embedding", $"cents", $"ccs").as("t"),
        call_function("subspace_l2", $"embedding", $"embedding", lit(m)).as("l"))
      .collect()
    out.foreach { r => (0 until 3).foreach(i => assert(r.isNullAt(i), r.toString)) }
    // adc: code out of the dtab's cell range → null
    val oob = spark.sql(
      "SELECT pq_adc(array(99), array(array(cast(1.0 as double)))) AS d")
    assert(oob.head().isNullAt(0))
  }

  test("encode + adc stay inside whole-stage codegen over the embeddings scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 64-dim vectors → 8×8 layout, derived codebook from the 2 lowest ids
    val cbd = graft.operators.PQ.subspaces(
        emb.filter($"vec_id" < 2), "vec_id", "embedding", 8, 8)
      .select($"j", $"id".as("c_id"), $"sub".as("cent"), $"ss".as("cc"))
    val row = graft.queries.CurationQ2.pqCodebookRow(cbd)
    val out = emb.crossJoin(broadcast(row))
      .select(call_function("pq_encode", $"embedding", $"cents", $"ccs").as("c"))
    assert(out.filter(size($"c") === 8).count() > 0)
    // inspect AFTER execution so the AQE plan is final and shows the
    // WholeStageCodegen stage markers
    val plan = out.filter(size($"c") === 8).queryExecution.executedPlan
    plan.executeCollect()
    val p = plan.toString
    assert(p.contains("pq_encode") && p.contains("*("), p)
  }
}
