package graft.queries

import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-checked relational operator pack (SURVEY.md §2.1-2.4, 2.6,
  * 2.7): scans, filters, equi/semi/anti joins, grouped aggregates,
  * window ranking, top-k, set ops.
  *
  * Float-parity policy: any SUM/AVG over a 2-decimal money column is
  * computed in DECIMAL (exact, order-independent) and cast to DOUBLE at
  * the end, so Spark and DuckDB produce bit-identical doubles
  * regardless of accumulation order. Integer-valued doubles (quantity)
  * sum exactly in binary FP and need no cast. Every query carries a
  * total ORDER BY so row order is deterministic on both engines.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** TPC-H Q1-style pricing summary: multi-aggregate single pass (A1/A3,
    * S6 pushdown — the shipdate filter reaches the parquet scan).
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection + derived column (P1/P2/P4/P7); predicates and
    * the 5-column projection push down to the parquet scan.
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .filter(
        col("l_shipdate").between(lit("1998-01-01").cast("timestamp"), lit("1999-12-31").cast("timestamp")) &&
          col("l_quantity") >= 30 && col("l_returnflag") === "R")
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_linenumber"), col("l_quantity"),
        (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
          .cast("double").as("disc_price"))
      .orderBy("l_orderkey", "l_linenumber")

  val q2Sql: String =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01 00:00:00' AND TIMESTAMP '1999-12-31 00:00:00'
      |  AND l_quantity >= 30 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Multi-way equi-join lineitem-orders-customer-nation with dimension
    * broadcast (J1/J4): revenue per nation. nation (25 rows) and
    * customer (small vs lineitem) broadcast; the lineitem-orders join
    * shuffles on orderkey — the natural key at 100 TB.
    */
  def q3RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Sources.lineitem(spark, dir)
    val o = Sources.orders(spark, dir)
    val c = Sources.customer(spark, dir)
    val n = Sources.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val q3Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Left semi-join (J2): orders having any high-quantity lineitem,
    * counted per priority.
    */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Sources.orders(spark, dir)
    val big = Sources.lineitem(spark, dir).filter(col("l_quantity") >= 48)
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left anti-join: customers with no high-value (>= 300k) order. */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Sources.customer(spark, dir)
    val o = Sources.orders(spark, dir).filter(col("o_totalprice") >= 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q5Sql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice >= 300000)
      |ORDER BY c_custkey""".stripMargin

  /** Global top-k (O-series): `TakeOrderedAndProject`, no full sort at
    * scale. Unique orderkey tiebreak keeps it deterministic.
    */
  def q6TopkOrders(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val q6Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** Ranked window (W-series): latest order per customer; Spark plans a
    * per-partition group-limit (WindowGroupLimit) instead of a full
    * sort per key.
    */
  def q7LatestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Sources.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }

  val q7Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
      |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** Distinct count per group (A6 exact form; `approx_count_distinct`
    * is the 100 TB sketch variant, not oracle-safe).
    */
  def q8SupplierSpread(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"), count(lit(1)).as("n_items"))
      .orderBy("l_partkey")

  val q8Sql: String =
    """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_items
      |FROM lineitem
      |GROUP BY l_partkey
      |ORDER BY l_partkey""".stripMargin

  /** A4 — grouped mode with the pandas idxmax tie-break (smallest value
    * among tied counts), per SURVEY.md §7.4#2.
    */
  def q9ModeQuantity(spark: SparkSession, dir: String): DataFrame =
    graft.ops.GroupStats.modeWithTieBreak(
      Sources.lineitem(spark, dir), Seq("l_returnflag"), "l_quantity", "mode_qty")
      .orderBy("l_returnflag")

  val q9Sql: String =
    """SELECT l_returnflag, l_quantity AS mode_qty
      |FROM (SELECT l_returnflag, l_quantity,
      |        row_number() OVER (PARTITION BY l_returnflag ORDER BY count(*) DESC, l_quantity ASC) AS rk
      |      FROM lineitem
      |      WHERE l_quantity IS NOT NULL
      |      GROUP BY l_returnflag, l_quantity)
      |WHERE rk = 1
      |ORDER BY l_returnflag""".stripMargin

  /** A2/A7 — exact interpolated median (quantities are integer-valued,
    * so the interpolated halves are exactly representable).
    */
  def q10MedianQuantity(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        graft.ops.GroupStats.exactMedian(col("l_quantity")).as("median_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy("l_returnflag")

  val q10Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  min(l_quantity) AS min_qty,
      |  max(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Set operations (§2.7): EXCEPT / INTERSECT over nation keys. */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Sources.customer(spark, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val supp = Sources.supplier(spark, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val only = cust.except(supp).withColumn("tag", lit("cust_only"))
    val both = cust.intersect(supp).withColumn("tag", lit("both"))
    only.unionByName(both).select("tag", "nationkey").orderBy("tag", "nationkey")
  }

  val q11Sql: String =
    """SELECT tag, nationkey FROM (
      |  SELECT 'cust_only' AS tag, nationkey FROM
      |    (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'both' AS tag, nationkey FROM
      |    (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |)
      |ORDER BY tag, nationkey""".stripMargin

  /** ROLLUP hierarchy totals (grouping-sets family, §2.4 "free" row):
    * revenue by (returnflag, linestatus) with subtotals and grand
    * total; `grouping()` flags disambiguate real NULLs from rollup
    * NULLs.
    */
  def q33Rollup(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))

  val q33Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty, count(*) AS n,
      |  CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS TINYINT) AS g_ls
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  /** Sketch variants for the 100 TB path (rows-only: HLL/KLL results
    * are implementation-specific): approx distinct counts and
    * approx percentiles next to their exact anchors.
    */
  def q35ApproxSketches(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        graft.ops.GroupStats.exactMedian(col("l_quantity")).as("exact_median"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_median"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_rollup" -> (q33Rollup _),
    "q35_approx_sketches" -> (q35ApproxSketches _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_revenue_by_nation" -> (q3RevenueByNation _),
    "q4_semi_join" -> (q4SemiJoin _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_topk_orders" -> (q6TopkOrders _),
    "q7_latest_order_per_customer" -> (q7LatestOrderPerCustomer _),
    "q8_supplier_spread" -> (q8SupplierSpread _),
    "q9_mode_quantity" -> (q9ModeQuantity _),
    "q10_median_quantity" -> (q10MedianQuantity _),
    "q11_set_ops" -> (q11SetOps _))

  val oracle: Map[String, String] = Map(
    "q33_rollup" -> q33Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_revenue_by_nation" -> q3Sql,
    "q4_semi_join" -> q4Sql,
    "q5_anti_join" -> q5Sql,
    "q6_topk_orders" -> q6Sql,
    "q7_latest_order_per_customer" -> q7Sql,
    "q8_supplier_spread" -> q8Sql,
    "q9_mode_quantity" -> q9Sql,
    "q10_median_quantity" -> q10Sql,
    "q11_set_ops" -> q11Sql)
}
