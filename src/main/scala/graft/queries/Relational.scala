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

  private val ProfileCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

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

    // Q4-style semi-join: orders with at least one returned lineitem.
    "q4_order_priority" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val returned = Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
      orders.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Anti-join: customers who never placed an URGENT order (plain
    // no-orders-at-all is empty on this data — every customer orders).
    "q_cust_no_orders" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // ROLLUP: revenue at (region, nation), per-region and grand-total
    // levels in one pass.
    "q_rollup_revenue" -> ((s, dir) => {
      val lineitem = Tables(s, dir, "lineitem")
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      val nation = Tables(s, dir, "nation")
      val region = Tables(s, dir, "region")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // Q14-style: promo share of revenue (LIKE filter over part join).
    "q14_promo_share" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val part = Tables(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO",
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))) * lit(100) /
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")))
            .cast("double").as("promo_share"))
        .select(round(col("promo_share"), 6).as("promo_share"))
    }),

    // Supplier-side join path (supplier ⋈ nation dimension chain).
    "q_supplier_revenue" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val supp = Tables(s, dir, "supplier")
      val nation = Tables(s, dir, "nation")
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
        .orderBy(col("n_name"))
    }),

    // Exact interpolated percentiles per group (the reference's quality
    // percentile machinery applied relationally).
    "q_value_percentiles" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy(col("event_type"))),

    // One-pass numeric profile of the fact table: exact counts / nulls /
    // min / max / DECIMAL-exact mean / distinct per column from a single
    // aggregate, with approx_count_distinct gated at 5% relative error.
    "q_column_profile" -> ((s, dir) =>
      graft.ops.CorpusStats.profileNumeric(Tables(s, dir, "lineitem"),
        ProfileCols)),

    // Per-row z-score + min-max feature scaling: one DECIMAL-exact
    // stats aggregate, constants inlined as literals, map-only scaled
    // projection — no broadcast, no join, no second scan.
    "q_feature_scale" -> ((s, dir) =>
      graft.ops.CorpusStats.scaleFeatures(Tables(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), ProfileCols)
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // One-pass Pearson correlation matrix: every co-moment (n, sums,
    // product-sums per pair) from a single DECIMAL-exact aggregate —
    // no self-join, no second scan; closed form in doubles on
    // identical operands both engines.
    "q_corr_matrix" -> ((s, dir) =>
      graft.ops.CorpusStats.correlationMatrix(Tables(s, dir, "lineitem"),
        ProfileCols)),

    // Quantile SKETCH path gated against exact ranks: percentile_approx
    // is Spark's mergeable quantile summary — one map-side-combined
    // aggregate, bounded state per group, no sort. At 100 TB it IS the
    // product (exact percentile needs a full per-group sort); here the
    // exact side both feeds the oracle columns and gates the sketch:
    // each approx cut point's true rank must sit within 0.005 of its
    // target (guarantee is 1/accuracy = 1e-4, 50x slack). The output
    // exposes only exact values + the gate bit, so sketch merge-order
    // jitter cannot touch the hash.
    "q_quantile_sketch" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"),
          count(lit(1)).as("n"))
      val ranks = li.join(broadcast(approx), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          (sum(when(col("l_extendedprice") <= col("ap")(0), 1L).otherwise(0L))
            .cast("double") / first(col("n"))).as("r50"),
          (sum(when(col("l_extendedprice") <= col("ap")(1), 1L).otherwise(0L))
            .cast("double") / first(col("n"))).as("r90"),
          (sum(when(col("l_extendedprice") <= col("ap")(2), 1L).otherwise(0L))
            .cast("double") / first(col("n"))).as("r99"))
      li.groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"))
        .join(broadcast(ranks), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p50"), col("p90"), col("p99"),
          (abs(col("r50") - 0.5) <= 0.005 &&
            abs(col("r90") - 0.9) <= 0.005 &&
            abs(col("r99") - 0.99) <= 0.005).as("qs_ok"))
        .orderBy(col("l_returnflag"))
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
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_cust_no_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q14_promo_share" ->
      """SELECT round(CAST(
        |  SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) * 100 /
        |  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |  AS DOUBLE), 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q_supplier_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT s_suppkey) AS n_suppliers
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_column_profile" ->
      graft.ops.CorpusStats.profileOracleSql("lineitem", ProfileCols),
    "q_feature_scale" ->
      graft.ops.CorpusStats.scaleOracleSql("lineitem",
        Seq("l_orderkey", "l_linenumber"), ProfileCols),
    "q_corr_matrix" ->
      graft.ops.CorpusStats.corrOracleSql("lineitem", ProfileCols),
    "q_quantile_sketch" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
        |  TRUE AS qs_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_orders_per_cust" ->
      """SELECT c_custkey, c_mktsegment,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin
  )
}
