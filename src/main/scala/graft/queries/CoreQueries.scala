package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Core relational query suite over the driver's TPC-H-ish tables.
  *
  * Each query exercises a scan/filter/join/aggregate/window/set-op shape the
  * engine must support (SURVEY.md §2), and has an exactly-equivalent DuckDB
  * oracle in [[oracleSql]].
  *
  * Cross-engine determinism policy: monetary/quantity aggregates are computed
  * on exact integer cents (`round(x*100)::long`) rather than floating-point
  * sums, because double summation order differs between engines and executors.
  * Presentational doubles are derived by a single IEEE division from the exact
  * integer, which is bit-identical in any IEEE-754 engine. At 100 TB the cent
  * sums would use DECIMAL(38,0) to dodge int64 overflow; at bench scale int64
  * headroom is ~1e3x.
  */
object CoreQueries {

  /** Exact integer cents from a 2-decimal double column. */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** Exact integer percent (0-100) from a 2-decimal fraction column
    * (discount/tax); the small scale keeps products within int64 at SF100. */
  private def pct(c: Column): Column = round(c * 100).cast("long")

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-style pricing summary: full-scan groupBy aggregation with
    * map-side partial aggregation (2 grouping keys, 6 aggregates). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
    li.filter($"l_shipdate" <= to_timestamp(lit("1999-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(cents($"l_quantity")).as("sum_qty_c"),
        sum(cents($"l_extendedprice")).as("sum_base_c"),
        sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).as("sum_disc_e4"),
        sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount")) * (lit(100L) + pct($"l_tax"))).as("sum_charge_e6"),
        count(lit(1)).as("count_order")
      )
  }

  // ---------------------------------------------------------------- q2
  /** Filter + projection: predicate and column pruning must reach the
    * parquet scan (PushedFilters / 3-column ReadSchema). */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .filter(
        $"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01")) &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24
      )
      .select(
        $"l_orderkey",
        $"l_linenumber",
        (cents($"l_extendedprice") * pct($"l_discount")).as("disc_revenue_e4")
      )
  }

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3-style 3-way join + aggregation + deterministic top-k.
    * customer is the small side (broadcast); orders⨝lineitem shuffles on
    * orderkey. Top-10 ordering is made total by the orderkey tiebreak. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val cust = t.customer.filter($"c_mktsegment" === "BUILDING")
    val ord  = t.orders.filter($"o_orderdate" < to_timestamp(lit("1998-03-15")))
    val li   = t.lineitem.filter($"l_shipdate" > to_timestamp(lit("1996-03-15")))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).as("revenue_e4"))
      .orderBy($"revenue_e4".desc, $"l_orderkey".asc)
      .limit(10)
  }

  // ---------------------------------------------------------------- q4
  /** Star-schema rollup over two broadcast dimensions (supplier ⨝ nation ⨝
    * region): the fact side never shuffles for the join. */
  def q4RegionRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.supplier
      .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(cents($"s_acctbal")).as("sum_acctbal_c"),
        countDistinct($"n_name").as("n_nations")
      )
  }

  // ---------------------------------------------------------------- q5
  /** Window functions: per-customer order sequence with row_number + lag.
    * One shuffle on the partition key; ordering key (o_orderdate,
    * o_orderkey) is total so results are deterministic. */
  def q5OrderSequence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables(spark, dir).orders
      .withColumn("order_seq", row_number().over(w))
      .withColumn("prev_price_c", lag(cents($"o_totalprice"), 1).over(w))
      .withColumn("delta_price_c", cents($"o_totalprice") - lag(cents($"o_totalprice"), 1).over(w))
      .filter($"order_seq" <= 3)
      .select($"o_custkey", $"o_orderkey", $"order_seq", $"prev_price_c", $"delta_price_c")
  }

  // ---------------------------------------------------------------- q6
  /** Aggregation + deterministic global top-k (TopK via orderBy+limit —
    * Spark plans this as TakeOrderedAndProject, no full sort at scale). */
  def q6TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.orders
      .groupBy($"o_custkey")
      .agg(sum(cents($"o_totalprice")).as("total_spent_c"), count(lit(1)).as("n_orders"))
      .orderBy($"total_spent_c".desc, $"o_custkey".asc)
      .limit(20)
  }

  // ---------------------------------------------------------------- q7
  /** Distinct aggregation: suppliers-per-part plus order count. Exercises
    * the two-phase distinct-aggregate expansion. */
  def q7DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .groupBy($"l_partkey")
      .agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_orderkey").as("n_ord"),
        count(lit(1)).as("n_lines")
      )
      .filter($"n_supp" >= 2)
  }

  // ---------------------------------------------------------------- q8
  /** Heterogeneous union (the reference's tracer-events shape, SURVEY §2.8):
    * two differently-shaped inputs normalized to one schema and unioned. */
  def q8UnionParties(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val c = t.customer
      .filter($"c_acctbal" > 9000)
      .select($"c_name".as("name"), lit("customer").as("kind"), cents($"c_acctbal").as("acctbal_c"), $"c_nationkey".as("nationkey"))
    val s = t.supplier
      .filter($"s_acctbal" > 9000)
      .select($"s_name".as("name"), lit("supplier").as("kind"), cents($"s_acctbal").as("acctbal_c"), $"s_nationkey".as("nationkey"))
    c.unionByName(s)
  }

  // ---------------------------------------------------------------- q9
  /** Semi + anti joins (EXISTS / NOT EXISTS): customers who have orders but
    * none marked urgent. The anti side streams; no row explosion. */
  def q9CustomersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val urgent = t.orders.filter($"o_orderpriority" === "1-URGENT")
    t.customer
      .join(t.orders, $"c_custkey" === $"o_custkey", "left_semi")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  // ---------------------------------------------------------------- q10
  /** Conditional aggregation (CASE WHEN pivot-style) by priority bucket. */
  def q10PriorityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .groupBy($"o_orderstatus")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_count"),
        sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_count"),
        sum(when($"o_orderpriority" === "1-URGENT", cents($"o_totalprice")).otherwise(0L)).as("urgent_value_c")
      )
  }

  // ---------------------------------------------------------------- q31
  /** ROLLUP grouping sets: subtotal rows per (status), grand total row. */
  def q31Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), sum(cents($"o_totalprice")).as("total_c"))
  }

  // ---------------------------------------------------------------- q32
  /** INTERSECT / EXCEPT set operations: customers who ordered urgent but
    * never low-priority, via distinct set algebra on the key domain. */
  def q32SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
    val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val high   = o.filter($"o_orderpriority" === "2-HIGH").select($"o_custkey")
    val low    = o.filter($"o_orderpriority" === "5-LOW").select($"o_custkey")
    urgent.intersect(high).except(low)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_rollup" -> q31Rollup _,
    "q32_set_ops" -> q32SetOps _,
    "q1_pricing_summary"   -> q1PricingSummary _,
    "q2_filter_project"    -> q2FilterProject _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q4_region_rollup"     -> q4RegionRollup _,
    "q5_order_sequence"    -> q5OrderSequence _,
    "q6_top_customers"     -> q6TopCustomers _,
    "q7_distinct_agg"      -> q7DistinctAgg _,
    "q8_union_parties"     -> q8UnionParties _,
    "q9_customers_no_orders" -> q9CustomersNoOrders _,
    "q10_priority_buckets" -> q10PriorityBuckets _
  )

  val oracleSql: Map[String, String] = Map(
    "q32_set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin,
    "q31_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round(l_discount*100) AS BIGINT) AS disc_revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_e4 DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q4_region_rollup" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_acctbal_c,
        |  count(DISTINCT n_name) AS n_nations
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q5_order_sequence" ->
      """SELECT o_custkey, o_orderkey, order_seq, prev_price_c, delta_price_c FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS order_seq,
        |    lag(CAST(round(o_totalprice*100) AS BIGINT), 1) OVER w AS prev_price_c,
        |    CAST(round(o_totalprice*100) AS BIGINT) - lag(CAST(round(o_totalprice*100) AS BIGINT), 1) OVER w AS delta_price_c
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |) WHERE order_seq <= 3""".stripMargin,
    "q6_top_customers" ->
      """SELECT o_custkey,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_spent_c,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spent_c DESC, o_custkey ASC LIMIT 20""".stripMargin,
    "q7_distinct_agg" ->
      """SELECT l_partkey,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_orderkey) AS n_ord,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_partkey HAVING count(DISTINCT l_suppkey) >= 2""".stripMargin,
    "q8_union_parties" ->
      """SELECT c_name AS name, 'customer' AS kind, CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_c, CAST(c_nationkey AS INT) AS nationkey
        |FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS kind, CAST(round(s_acctbal*100) AS BIGINT) AS acctbal_c, CAST(s_nationkey AS INT) AS nationkey
        |FROM supplier WHERE s_acctbal > 9000""".stripMargin,
    "q9_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q10_priority_buckets" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS urgent_value_c
        |FROM orders GROUP BY o_orderstatus""".stripMargin
  )
}
