package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import QueryDsl._

/** Relational core battery — joins, unions, subqueries, dedup, top-k.
  *
  * Mirrors the reference's LTA metadata path: the 4-branch superquery with
  * scalar subquery (`LTA/lta-query.py:32-76,112`), product filters and
  * dedup (`LTA/lta-retrieve.py:422-473`), retry anti-join (`:549`).
  * Re-expressed over the harness star schema; dimension joins broadcast.
  */
object Relational {

  /** A1/A5 scrunch-style grouped aggregation (the canonical bucketed
    * weighted aggregate, cf. `fluxcal/lofar_fluxcal.py:386-453`). */
  private def q01(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ep = col("l_extendedprice"); val disc = col("l_discount"); val tax = col("l_tax")
    val one = lit(1).cast(DecimalType(3, 2))
    val discPrice = (d2(ep) * (one - d2(disc))).cast(DecimalType(24, 4))
    val charge = (discPrice * (one + d2(tax))).cast(DecimalType(30, 6))
    li.filter(col("l_shipdate") <= tsLit("2000-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(ep).as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        sum(charge).cast(DoubleType).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(ep).as("avg_price"),
        davg(disc).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(${sqlD2("l_extendedprice")} * (CAST(1 AS DECIMAL(3,2)) - ${sqlD2("l_discount")}) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(CAST(CAST(${sqlD2("l_extendedprice")} * (CAST(1 AS DECIMAL(3,2)) - ${sqlD2("l_discount")}) AS DECIMAL(24,4)) * (CAST(1 AS DECIMAL(3,2)) + ${sqlD2("l_tax")}) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** J1+U1 multi-branch superquery: joins through the full dimension chain
    * with per-branch predicates, UNION-distinct of the branches
    * (`LTA/lta-query.py:32-76`). Dimensions are broadcast.
    *
    * The reference's UNION of three branch queries would scan the fact
    * tables once PER BRANCH — at 100 TB that's 3 full scans. The branch
    * predicates are mutually exclusive on (r_name, o_orderstatus), so ONE
    * scan with the disjunctive predicate produces the same row set; the
    * oracle keeps the reference's UNION form as an independent derivation.
    * (Each row matches at most one branch, so UNION-distinct ≡ distinct of
    * the disjunctive scan.) */
  private def q02(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    val branches = Seq("ASIA" -> "F", "EUROPE" -> "O", "AMERICA" -> "P")
    val pred = branches
      .map { case (rn, st) => r("r_name") === rn && o("o_orderstatus") === st }
      .reduce(_ || _)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(pred)
      .select(o("o_orderkey").as("okey"), o("o_totalprice").as("price"),
        n("n_name").as("nation_name"), r("r_name").as("region_name"))
      .distinct()
      .orderBy(col("okey"))
  }

  private val q02Sql =
    """SELECT o_orderkey AS okey, o_totalprice AS price, n_name AS nation_name, r_name AS region_name
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
      |UNION
      |SELECT o_orderkey, o_totalprice, n_name, r_name
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND o_orderstatus = 'O'
      |UNION
      |SELECT o_orderkey, o_totalprice, n_name, r_name
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA' AND o_orderstatus = 'P'
      |ORDER BY okey""".stripMargin

  /** J2 scalar subquery: rows above the global mean
    * (`LTA/lta-query.py:112`). Scalar computed exactly, broadcast. */
  private def q03(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val avgDf = o.agg(davg(col("o_totalprice")).as("global_avg"))
    o.crossJoin(broadcast(avgDf))
      .filter(col("o_totalprice") > col("global_avg"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val q03Sql =
    s"""SELECT o_orderkey, o_totalprice FROM orders
       |WHERE o_totalprice > (SELECT ${sqlDavg("o_totalprice")} FROM orders)
       |ORDER BY o_orderkey""".stripMargin

  /** O1/O4 deterministic top-k (price desc, key asc tiebreak). */
  private def q04(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  private val q04Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin

  /** J11/U2 anti-join: customers with no orders (retry-set semantics,
    * `LTA/lta-retrieve.py:549`). */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
        col("o_orderdate") < tsLit("1997-01-01"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** J9/U5 semi-join: suppliers having shipped anything. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val sp = Tables.supplier(s, d)
    val li = Tables.lineitem(s, d)
    sp.join(li, sp("s_suppkey") === li("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  private val q06Sql =
    """SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |ORDER BY s_suppkey""".stripMargin

  /** A16 dedup keep-first (`LTA/lta-retrieve.py:466-468`): deterministic
    * via min-key per group rather than dropDuplicates' arbitrary row. */
  private def q07(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(min(col("o_orderkey")).as("first_orderkey"), count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"), col("o_orderstatus"))

  private val q07Sql =
    """SELECT o_custkey, o_orderstatus, MIN(o_orderkey) AS first_orderkey, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey, o_orderstatus
      |ORDER BY o_custkey, o_orderstatus""".stripMargin

  /** W5 ranking: top-3 customers per market segment. */
  private def q08(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  private val q08Sql =
    """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
      |  FROM customer) t
      |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin

  /** A17 catalog totals: global sums/counts/extremes. */
  private def q09(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(
      count(lit(1)).as("n_orders"),
      dsum(col("o_totalprice")).as("total_price"),
      countDistinct(col("o_custkey")).as("n_customers"),
      min(col("o_orderdate")).as("first_date"),
      max(col("o_orderdate")).as("last_date"))

  private val q09Sql =
    s"""SELECT COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_price,
       |  COUNT(DISTINCT o_custkey) AS n_customers,
       |  MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
       |FROM orders""".stripMargin

  /** F1/C12 regex product filter + field extraction
    * (`LTA/lta-retrieve.py:422-457,190-193`). */
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").rlike("join .*merge") && col("lang").isin("en", "de"))
      .withColumn("src_num", regexp_extract(col("source"), "src(\\d+)", 1).cast(LongType))
      .select(col("doc_id"), col("src_num"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val q10Sql =
    """SELECT doc_id, CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS src_num, lang, n_chars
      |FROM documents
      |WHERE regexp_matches(text, 'join .*merge') AND lang IN ('en','de')
      |ORDER BY doc_id""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery("q01_pricing_summary", q01, Some(q01Sql), Seq("A1", "A5", "S8")),
    GQuery("q02_superquery_union", q02, Some(q02Sql), Seq("J1", "U1", "K1")),
    GQuery("q03_scalar_subquery", q03, Some(q03Sql), Seq("J2")),
    GQuery("q04_topk_orders", q04, Some(q04Sql), Seq("O1", "O4")),
    GQuery("q05_antijoin_customers", q05, Some(q05Sql), Seq("J11", "U2")),
    GQuery("q06_semijoin_suppliers", q06, Some(q06Sql), Seq("J9", "U5")),
    GQuery("q07_dedup_keep_first", q07, Some(q07Sql), Seq("A16")),
    GQuery("q08_segment_top3", q08, Some(q08Sql), Seq("W5", "O4")),
    GQuery("q09_catalog_totals", q09, Some(q09Sql), Seq("A17")),
    GQuery("q10_regex_filter", q10, Some(q10Sql), Seq("F1", "F2", "C12")))
}
