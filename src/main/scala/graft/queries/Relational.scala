package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** General relational surface over the driver testdata — exercises the
  * scan → filter → join → aggregate → window spine the engine is built on.
  *
  * Aggregates over money-like doubles go through DECIMAL so Spark and the
  * DuckDB oracle sum exactly (double summation order would otherwise drift
  * in the last bits); the final cast back to double is then deterministic.
  */
object Relational {

  /** sum(double) made order-insensitive: exact decimal accumulate, then one
    * deterministic conversion back to double.
    */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: hash aggregate with map-side combine;
    // at 100 TB this is a single shuffle keyed by a 6-value composite key.
    "q1_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-way join: region/nation/customer are dimension tables that Spark
    // auto-broadcasts (verified in the plan) — no shuffle on the probe side
    // beyond the final group-by.
    "q5_local_revenue" -> ((s, dir) => {
      val region = Tables(s, dir, "region")
      val nation = Tables(s, dir, "nation")
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      val lineitem = Tables(s, dir, "lineitem")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Window function: top order per customer by total price
    // (rank inside partition — the shuffle is keyed by o_custkey only).
    "q_top_order_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey"),
          col("o_orderkey").as("top_orderkey"),
          round(col("o_totalprice"), 2).as("top_totalprice"))
        .orderBy(col("o_custkey"))
    }),

    // Event-time windowed aggregation (batch form of the streaming query in
    // graft.streaming): hourly per-type counts and exact value sums.
    "q_events_hourly" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // Outer-join surface: orders per customer, zero included for customers
    // with no orders (count(o_orderkey) skips the null-extended rows).
    "q_orders_per_cust" -> ((s, dir) => {
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      customer
        .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spend"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_local_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_top_order_per_cust" ->
      """SELECT o_custkey, top_orderkey, top_totalprice FROM (
        |  SELECT o_custkey, o_orderkey AS top_orderkey,
        |    ROUND(o_totalprice, 2) AS top_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_orders_per_cust" ->
      """SELECT c_custkey, c_mktsegment,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin
  )
}
