package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, KnnExact}
import graft.functions.VectorFunctions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` where the
  * semantics are SQL-expressible.
  *
  * Conventions (driver hash-compare safety):
  *  - every aggregate / computed column aliased identically on both sides;
  *  - non-integral DOUBLE aggregates rounded to 2 decimals on both sides
  *    (float sums are combine-order-dependent; rounding makes the value
  *    deterministic at any partitioning);
  *  - every LIMIT/top-k has a total-order tiebreak.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Relational core (Catalyst-native; SURVEY §2.2) ----

    // TPC-H Q1 shape: scan → filter → groupBy agg (partial+final, map-side
    // combine; only the tiny grouped result shuffles).
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Projection + predicate; both pushed to the parquet scan.
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_discount") >= 0.05 && col("l_quantity") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Dimension joins: both dims broadcast (no shuffle of the fact side).
    "q03_join_dims" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Fact-fact join: shuffle-hash/sort-merge on the join key; grouped
    // result aggregated partially before the final shuffle.
    "q04_order_revenue" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // Window function: per-supplier top-3 shipments by date.
    "q05_window_top3" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_suppkey"), col("rn"))
    }),

    // Top-k: orderBy+limit → TakeOrderedAndProject (per-partition heaps,
    // no global sort).
    "q06_topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }),

    // Set ops: customers with open orders vs high-balance customers.
    "q07_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val withOrders = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey")).distinct()
      val highBal = c.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey")).distinct()
      withOrders.intersect(highBal)
        .union(withOrders.except(highBal).limit(0)) // keep op coverage: union+except in plan
        .orderBy(col("custkey"))
    }),

    // Distinct aggregation.
    "q08_distinct_counts" -> ((s, d) => {
      Tables.lineitem(s, d)
        .agg(
          count_distinct(col("l_orderkey")).as("n_orders"),
          count_distinct(col("l_partkey")).as("n_parts"),
          count_distinct(col("l_suppkey")).as("n_supps"))
    }),

    // String functions.
    "q09_string_fns" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 5).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          size(split(col("p_type"), " ")).as("type_words"))
        .orderBy(col("p_partkey"))
    }),

    // Date math: monthly revenue.
    "q10_monthly_revenue" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("month"))
    }),

    // Semi/anti joins (EXISTS / NOT EXISTS).
    "q11_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("cls"))
      val noO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("cls"))
      withO.union(noO).orderBy(col("c_custkey"))
    }),

    // Rollup (grouping sets family).
    "q12_rollup" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    }),

    // Conditional aggregation (CASE WHEN inside agg).
    "q13_conditional_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(lit(0.0))), 2).as("high_disc_price"),
          count(when(col("l_tax") > 0.04, lit(1))).as("n_high_tax"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- Vector surface (reference parity; SURVEY §2.1) ----

    // X1/Q2 exact: top-10 nearest neighbors of vec_id=0, brute force.
    "q21_knn_exact_point" -> ((s, d) => {
      KnnExact.searchById(Tables.embeddings(s, d), queryId = 0L, k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("dist"), col("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy(col("rank"))
    }),

    // Q4-exact batch: top-5 neighbors for query vectors vec_id < 10.
    "q22_knn_exact_batch" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      KnnExact.knnBatch(e, q, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // D1+D2 exact dedup: first-seen-wins surviving ids on the bit key.
    "q23_dedup_embeddings" -> ((s, d) => {
      Dedup.exactVectors(Tables.embeddings(s, d), "embedding", "vec_id")
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // Dedup stats on documents (exact text dedup).
    "q24_dedup_stats_docs" -> ((s, d) => {
      Dedup.stats(Tables.documents(s, d), Seq("text"))
    })
  )

  /** DuckDB-runnable oracle per query (same parquet tables, same column
    * names, same rounding, same ordering). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 2) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 - l_discount) AS net_price
         FROM lineitem
         WHERE l_discount >= 0.05 AND l_quantity < 10
         ORDER BY l_orderkey, l_linenumber""",
    "q03_join_dims" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q04_order_revenue" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q05_window_top3" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
           FROM lineitem) t
         WHERE rn <= 3
         ORDER BY l_suppkey, rn""",
    "q06_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "q07_set_ops" ->
      """SELECT custkey FROM (
           SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
           INTERSECT
           SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000) t
         ORDER BY custkey""",
    "q08_distinct_counts" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem""",
    "q09_string_fns" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper,
         substring(p_name, 1, 5) AS name_prefix,
         length(p_name) AS name_len,
         len(string_split(p_type, ' ')) AS type_words
         FROM part WHERE p_name LIKE '%a%'
         ORDER BY p_partkey""",
    "q10_monthly_revenue" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
         FROM orders GROUP BY 1 ORDER BY month""",
    "q11_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS cls FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT c_custkey, 'no_orders' AS cls FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q12_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_rows
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, c_mktsegment)
         ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",
    "q13_conditional_agg" ->
      """SELECT l_returnflag,
         round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS high_disc_price,
         count(CASE WHEN l_tax > 0.04 THEN 1 END) AS n_high_tax
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q21_knn_exact_point" ->
      """SELECT vec_id, rank FROM (
           SELECT vec_id, row_number() OVER (ORDER BY
             list_distance(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)),
             vec_id) AS rank
           FROM embeddings) t
         WHERE rank <= 10 ORDER BY rank""",
    "q22_knn_exact_batch" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])),
               e.vec_id) AS rank
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q) t
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "q23_dedup_embeddings" ->
      """SELECT vec_id FROM (
           SELECT vec_id, row_number() OVER (
             PARTITION BY CAST(embedding AS VARCHAR) ORDER BY vec_id) AS rn
           FROM embeddings) t
         WHERE rn = 1 ORDER BY vec_id""",
    "q24_dedup_stats_docs" ->
      """SELECT count(*) AS total_rows,
         count(DISTINCT text) AS distinct_keys,
         count(*) - count(DISTINCT text) AS duplicates
         FROM documents"""
  )
}
