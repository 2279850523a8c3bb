package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables, VecReader}
import graft.operators.{Dedup, DedupClusters, KnnExact, MlLsh, Multimodal, TextAnalysis, TextDedup}
import graft.ann.AnnForest
import graft.streaming.EventStreams
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
  // ---- Gate-time shared builds (StoreCache; active only under the
  // Verify gate's -Dgraft.store.cache=1 — specs and Bench pay real
  // builds). Each helper is ONE deterministic seeded fit per fixture
  // that several self-contained queries would otherwise repeat. ----

  /** The (50 trees, leaf 5, seed 42) driver forest shared by the
    * traversal-family queries (q25/q26/q29/q35/q81/q83/q130). */
  private def forest50(s: SparkSession, d: String): graft.ann.AnnForestModel =
    graft.sources.StoreCache.model(s"annforest|50|5|42|$d") {
      AnnForest(numTrees = 50, maxLeafSize = 5, seed = 42L)
        .fit(Tables.embeddings(s, d), "vec_id", "embedding")
    }

  /** The (50, 5, depth 16, seed 42) distributed forest (q39/q83/q89). */
  private def dforest50(s: SparkSession, d: String): graft.ann.DistributedAnnModel =
    graft.sources.StoreCache.model(s"dannforest|50|5|16|42|$d") {
      graft.ann.DistributedAnnForest(
          numTrees = 50, maxLeafSize = 5, maxDepth = 16, seed = 42L)
        .fit(Tables.embeddings(s, d))
    }

  /** The (m 16, seed 42) PQ codebook (q63/q65/q83). */
  private def pq16(s: SparkSession, d: String): graft.ann.PqModel =
    graft.sources.StoreCache.model(s"pq|16|42|$d") {
      graft.ann.PqIndex(m = 16, seed = 42L).fit(Tables.embeddings(s, d))
    }

  /** The (m 12, efC 64, 4 shards, seed 42) NSW graph (q199). */
  private def nsw4(s: SparkSession, d: String): graft.ann.NswModel =
    graft.sources.StoreCache.model(s"nsw|12|64|4|42|$d") {
      graft.ann.NswGraph(m = 12, efConstruction = 64, numShards = 4, seed = 42L)
        .fit(Tables.embeddings(s, d), "vec_id", "embedding")
    }

  /** nsw4's HIERARCHICAL sibling (q213): same geometry, HNSW layer
    * stack + diversity-heuristic selection. */
  private def nswh4(s: SparkSession, d: String): graft.ann.NswModel =
    graft.sources.StoreCache.model(s"nswh|12|64|4|42|$d") {
      graft.ann.NswGraph(m = 12, efConstruction = 64, numShards = 4,
          seed = 42L, hierarchy = true)
        .fit(Tables.embeddings(s, d), "vec_id", "embedding")
    }

  /** q204/q205's synthetic audio fixture (every doc's WAV + the
    * half-volume perceptual duplicate of every 5th), settled with
    * localCheckpoint and memoized per (session, fixture) — the 6,000+
    * javax.sound encodes are fixture SYNTHESIS, not serving work
    * (round-10 verdict #8): the bench's min-of-3 now measures the
    * fingerprint + banded-pair cost on runs 2–3 (the min), and the
    * gate reuses one synthesis across the q204/q205 pair. Results are
    * byte-identical to inline synthesis (same deterministic encoder),
    * so the committed hash is unchanged. Keyed by session identity so
    * a stopped session's checkpointed blocks are never served. */
  private val clipMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def audioClips(s: SparkSession, d: String): DataFrame =
    clipMemo.computeIfAbsent(s"${System.identityHashCode(s)}|$d", _ => {
      import graft.operators.Multimodal
      val ids = Tables.documents(s, d).select(col("doc_id"))
      ids.select(col("doc_id").as("id"),
          Multimodal.syntheticWav(col("doc_id")).as("payload"))
        .unionByName(ids.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 100000L).as("id"),
            Multimodal.syntheticWavHalved(col("doc_id")).as("payload")))
        .localCheckpoint()
    })

  /** The (nlist 16, nprobe 4, seed 42) IVF quantizer (q37/q83). */
  private def ivf16x4(s: SparkSession, d: String): graft.ann.IvfModel =
    graft.sources.StoreCache.model(s"ivf|16|4|42|$d") {
      graft.ann.IvfIndex(nlist = 16, nprobe = 4, seed = 42L)
        .fit(Tables.embeddings(s, d))
    }

  /** Shared PRISTINE full-corpus BM25 index for the serving-path
    * queries (q84/q92/q95/q105): built once per fixture under the
    * cache, tombstones dropped on every use so each query starts from
    * the same clean state its private build used to provide (the only
    * mutation those queries perform is tombstoning — the core tables
    * stay pristine, which is what makes the share safe; lifecycle
    * queries that compact/append keep their private builds). */
  private def sharedDocsIndex(s: SparkSession, d: String): String = {
    val name = "graft_docs_idx_" +
      d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase(java.util.Locale.ROOT)
    // v11: champion selection moved to the 4dp weight grid — a cached
    // v10 tier would carry the old membership rule
    graft.sources.StoreCache.table(s, name, s"v11|buckets8|$d",
      Seq("_postings", "_terms", "_doclens", "_stats", "_positions",
        "_champions").map(name + _)) {
      val docs = Tables.documents(s, d)
      graft.operators.Bm25.buildIndex(docs, name, buckets = 8)
      graft.operators.Bm25.buildPositional(docs, name, buckets = 8)
      graft.operators.Bm25.buildChampions(s, name, c = 32, buckets = 8)
    }
    graft.sources.Sinks.dropTable(s, s"${name}_tombstones")
    name
  }

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
    // q116: TPC-H Q5 shape — 6-table star join, dims broadcast, one
    // fact-side shuffle for the final agg; the optimizer-reorder
    // showcase for the relational suite.
    "q116_regional_revenue" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA")
        .groupBy(n("n_name").as("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

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
    // Per-key top-3 served by the bounded-heap custom operator
    // (TopKPerKey) + a rank window that only ever sees ≤ 3 rows per
    // key — measured 4× faster than the corpus-wide row_number window
    // at sf0.1 (0.20s vs 0.76s, ProbeQ05Heap; O(n log k) heaps vs a
    // full per-partition sort), rows identical under the total-order
    // tiebreak. The window-function FAMILY stays demonstrated by
    // q43/q44 (lag/ntile/percent_rank/cume_dist).
    "q05_window_top3" -> ((s, d) => {
      graft.plans.TopKPerKey.rankedTopK(
          Tables.lineitem(s, d), "l_suppkey",
          Seq("l_shipdate", "l_orderkey", "l_linenumber"), 3)
        .select(col("l_suppkey"), col("rank").as("rn"),
          col("l_orderkey"), col("l_linenumber"))
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

    // Set ops — intersect, except, and union all contribute rows.
    "q07_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val withOrders = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey")).distinct()
      val highBal = c.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey")).distinct()
      withOrders.intersect(highBal)
        .withColumn("op", lit("both"))
        .union(withOrders.except(highBal).withColumn("op", lit("orders_only")))
        .orderBy(col("custkey"), col("op"))
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

    // Extended string functions: regex extraction, padding, translate,
    // reverse/repeat, substring search.
    "q09b_string_fns2" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        translate(col("p_type"), "aeiou", "12345").as("type_tr"),
        reverse(col("p_brand")).as("brand_rev"),
        repeat(col("p_brand"), 2).as("brand_2x"),
        instr(col("p_name"), "a").as("a_pos"))
        .orderBy(col("p_partkey"))
    }),

    // Extended date functions: part extraction, day-of-week, interval
    // month arithmetic (end-of-month clamping), last_day, day diffs.
    "q10b_date_fns" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofweek(col("o_orderdate")).as("dow"),
        expr("o_orderdate + INTERVAL '3' MONTH").as("plus3m"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))
    }),

    // Conditional scalar functions: coalesce / nullif / greatest /
    // least over nullable-by-construction values.
    "q13b_conditional_fns" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap1k"),
        when(col("c_acctbal") < 0, null).otherwise(col("c_acctbal")).as("bal_nonneg"))
        .orderBy(col("c_custkey"))
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

    // Outer-join taxonomy: a full outer between two deliberately
    // partial key sets, null-classified — completes inner/semi/anti/
    // left/lateral coverage elsewhere.
    "q11b_outer_joins" -> ((s, d) => {
      val evens = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      val high = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      evens.join(high, Seq("k"), "full_outer")
        .select(col("k"),
          when(col("c_acctbal").isNull, "high_only")
            .when(col("c_mktsegment").isNull, "even_only")
            .otherwise("both").as("side"))
        .orderBy(col("k"))
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

    // Exact percentiles (interpolated) per group.
    "q20_percentiles" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"),
          round(expr("percentile(l_quantity, 0.25)"), 2).as("q1_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Statistical aggregates: stddev / variance / correlation /
    // covariance. Computed over SMALL-magnitude columns (quantity,
    // discount) so combine-order float noise stays orders below the
    // rounding grain — stddev of a 1e8-scale column would not oracle.
    "q20c_stats_aggs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_pop(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // Sketch aggregates (HLL distinct-count): approximate by design, so
    // no cross-engine oracle — the exact/approx relative error is
    // asserted in SinksAndAggSpec instead (rows-only driver check).
    "q20b_sketches" -> ((s, d) => {
      Tables.lineitem(s, d)
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_p50"))
    }),

    // Cube (full grouping-set lattice).
    "q17_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // Math scalar functions (IEEE-exact subset — no libm divergence).
    "q18_math_fns" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          pow(col("l_discount"), 2).as("disc_sq"),
          abs(col("l_quantity") - lit(25.0)).as("abs_dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod"))
        .orderBy(col("l_orderkey"))
    }),

    // Pivot: market segments to columns (Spark .pivot; oracle via
    // conditional aggregation — identical output schema).
    "q19_pivot" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .pivot("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("n_name"))
    }),

    // Unpivot (melt) — the inverse of q19's pivot: wide per-line
    // measures to (key, metric, value) long form. The oracle is a
    // dialect-free UNION ALL, so the shape is pinned without relying
    // on DuckDB's UNPIVOT syntax.
    "q19b_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }),

    // Extended array functions, outputs scalarized (driver cannot
    // canonicalize ARRAY columns): sort/distinct/flatten via joined
    // strings, membership, search, slicing.
    "q14d_array_fns2" -> ((s, d) => {
      val toks = split(col("p_type"), " ")
      Tables.part(s, d).select(
        col("p_partkey"),
        array_join(array_sort(toks), "|").as("types_sorted"),
        size(array_distinct(toks)).as("n_distinct_words"),
        array_contains(toks, "PLATED").as("has_plated"),
        array_position(toks, "STEEL").cast("int").as("steel_pos"),
        array_join(slice(toks, 1, 2), "|").as("first_two"),
        element_at(array_repeat(col("p_brand"), 2), 2).as("brand_again"))
        .orderBy(col("p_partkey"))
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
    }),

    // Array scalar functions over the embedding column.
    "q14_array_fns" -> ((s, d) => {
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0d), (acc, v) => acc + v).as("norm_sq"))
        .orderBy(col("vec_id"))
    }),

    // JSON scalar extraction from the events props column.
    "q15_json_props" -> ((s, d) => {
      EventStreams.withParsedProps(Tables.events(s, d))
        .select(col("event_id"), col("prop_k"))
        .orderBy(col("event_id"))
    }),

    // As-of (point-in-time) semantics, Spark-natively: for every click,
    // the most recent prior purchase timestamp of the same user — a
    // running conditional max over an ordered per-user window; no
    // cross-product, one shuffle on user_id.
    // Window-function suite: running aggregate, offset (lag), ranking —
    // one partitioned total-ordered frame each. The running sum folds
    // rows in frame order on both engines (sequential, not
    // shuffle-order-dependent), so the doubles agree; rounded anyway
    // per convention.
    "q14b_window_suite" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("running_total",
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_order_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("order_seq", row_number().over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("order_seq"),
          col("running_total"), col("prev_order_date"))
        .orderBy(col("o_custkey"), col("order_seq"))
    }),

    // Extended window functions: ntile, percent_rank, cume_dist (exact
    // rank rationals — bit-identical across engines, no rounding),
    // first/last_value over a running frame, lead.
    "q14c_window_suite2" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("first_date", first(col("o_orderdate")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("next_order", lead(col("o_orderkey"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("quartile"),
          col("pr"), col("cd"), col("first_date"), col("next_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q16_asof_prior_purchase" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("prior_purchase_ts",
          max(when(col("event_type") === "purchase", col("ts"))).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("prior_purchase_ts"))
        .orderBy(col("event_id"))
    }),

    // ---- ANN surface (probabilistic — rows-only driver check; recall
    //      is asserted against the exact oracle in AnnForestSpec) ----

    // B1-B3 + Q1-Q2: seeded forest, batch search for 10 queries.
    "q25_ann_search" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val model = forest50(s, d)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      model.searchBatch(queries, topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Q4: bulk approximate k-NN self-join over the whole table.
    "q26_ann_knn_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val model = forest50(s, d)
      model.knnJoin(e, topK = 10).orderBy(col("query_id"), col("rank"))
    }),

    // Q3: k-NN result → id-set projection (reference src/main.rs:125-136)
    // — distances dropped, one (query, neighbor) pair per set member.
    "q28_knn_idsets" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      KnnExact.asIdSets(KnnExact.knnBatch(e, q, k = 5))
        .select(col("query_id"), explode(col("neighbor_ids")).as("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // X1: point lookup by label over the .vec corpus — word → embedding →
    // ANN search → neighbor ids mapped back to words via join (the
    // reference's dictionary lookups become joins, src/main.rs:80-93).
    "q29_word_neighbors" -> ((s, _) => {
      val vecs = VecReader.read(s, "/root/reference/data/test.vec", dim = 300)
      val model = AnnForest(numTrees = 10, maxLeafSize = 5, seed = 42L)
        .fit(vecs, "id", "embedding")
      val queries = vecs.filter(col("word").isin("the", "of", "in", "and"))
        .select(col("id").as("query_id"), col("embedding").as("qvec"))
      val res = model.searchBatch(queries, topK = 5)
      res.join(vecs.select(col("id"), col("word").as("query_word")),
          res("query_id") === col("id")).drop("id")
        .join(vecs.select(col("id"), col("word").as("neighbor_word")),
          res("neighbor_id") === col("id")).drop("id")
        .select(col("query_word"), col("rank"), col("neighbor_word"))
        .orderBy(col("query_word"), col("rank"))
    }),

    // The 100 TB ANN path: leaf-bucket co-partitioned k-NN join — no
    // broadcast of the store, shuffles only on (tree_id, leaf_id). The
    // corpus doubles as the query set (reference Q4 bulk self-join), so
    // the self-join fast path applies: one routing pass feeds both
    // sides (result-identical to knnJoinBucketed(e, e, k) — asserted in
    // AnnForestSpec).
    "q35_ann_bucketed_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val model = forest50(s, d)
      model.knnSelfJoinBucketed(e, topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Attribute-filtered kNN — the canonical production vector-search
    // query ("nearest neighbors WHERE label = 3"). Exact path here so
    // the query carries a full DuckDB oracle (hash-comparable like
    // q22); the ANN form pushes the same predicate below the bucket
    // join — AnnForestModel.knnJoinBucketed(corpusFilter = …) — with
    // recall + filter-below-exchange plan shape pinned in
    // AnnForestSpec/PlanSpec.
    "q81_filtered_knn" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      KnnExact.knnBatch(e.filter(col("label") === 3), q, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Distance-threshold ("radius") join: all neighbors within squared
    // distance 1.2535 for 50 queries. Exact operator (KnnExact
    // .radiusJoin — zero post-scan shuffles), so the output is a
    // deterministic SET and carries a full DuckDB oracle, unlike top-k
    // ANN. The threshold sits mid-gap in the fixture's pair-distance
    // distribution (nearest boundary pair is >2e-3 away — f64 noise
    // can't flip membership). The approximate forest/IVF forms
    // (radiusJoinBucketed / IvfModel.radiusJoin) are recall-floored
    // against this exact path in AnnForestSpec.
    "q82_radius_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      KnnExact.radiusJoin(e, q, maxDist = 1.2535)
        .select(col("query_id"), col("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // The PRODUCTION radius path under the same exact oracle as q82:
    // bucket join + threshold tail, with query-side spill routing at
    // eps=0.25 recovering every in-radius pair of this fixture (the
    // found set is provably ⊆ exact — distances are computed exactly —
    // and spill makes it ⊇ here, so the hash match proves equality).
    // Deterministic: seeded forest, set-semantics output.
    "q86_radius_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val model = forest50(s, d)
      model.radiusJoinBucketed(e, q, maxDist = 1.2535, querySpillEps = 0.25)
        .select(col("query_id"), col("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // Radius search with ZONE-MAP bucket pruning on the standing
    // distributed store: per-bucket centroid + covering radius let a
    // query skip buckets the radius provably can't reach (reverse
    // triangle inequality — sound, so the result set is identical and
    // the exact q82 oracle applies unchanged). Spill routing buys the
    // recall (eps 0.25 recovers every in-radius pair here), zone maps
    // cancel the unreachable probes it added: 5% of probes pruned at
    // this wide radius, 35% at maxDist=0.1 on the same fixture
    // (tools/ProbeZoneMap; random vectors are the worst case — real
    // corpora cluster, and near-dup radii are tight).
    "q89_radius_zonemap" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val model = dforest50(s, d)
      model.radiusJoin(q, maxDist = 1.2535, querySpillEps = 0.25,
          useZoneMaps = true)
        .select(col("query_id"), col("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // IVF ANN backend: k-means coarse quantizer, nprobe cell probing.
    "q37_ivf_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val model = ivf16x4(s, d)
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      model.knnJoin(e, queries, topK = 10).orderBy(col("query_id"), col("rank"))
    }),

    // Fully distributed forest build (no driver collect of the store):
    // level-synchronous construction, depth-bounded planes, bucket-join
    // k-NN tail. The path that replaces AnnForest.fit beyond driver
    // memory (~10⁸ rows); see DistributedAnnForest scaladoc.
    "q39_ann_distributed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val model = dforest50(s, d)
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      model.knnJoin(queries, topK = 10).orderBy(col("query_id"), col("rank"))
    }),

    // Product quantization: the compressed-corpus scale path. The ADC
    // scan reads only (id, m-byte code); the raw vectors are touched
    // only for the 10k-per-query shortlist in the exact refine. The
    // embeddings fixture is near-uniform random — PQ's worst case (no
    // structure for the codebooks to exploit), so the shortlist is a
    // wide 10× and m=16 (4 dims/subspace). With that, the refined
    // top-10 recovers the exact top-10 (verified via tools/check.py),
    // so this query gets the full DuckDB brute-force oracle — the
    // approximation is inside, the contract is exact.
    "q63_pq_refined" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val pq = pq16(s, d)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val shortlist = pq.knnJoin(pq.encode(e).select("vec_id", "pq_code"),
          queries, topK = 100)
        .select("query_id", "neighbor_id")
      pq.refine(shortlist, e, queries, topK = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ: coarse cells bound the scan, PQ codes bound the bytes —
    // the FAISS-IVFPQ composition — then the exact refine recovers the
    // exact top-10 from the ADC shortlist (q63's pattern), so this
    // carries the full DuckDB brute-force oracle: approximation inside,
    // exact contract outside. Parameters are sized for the fixture's
    // worst case (near-uniform random vectors — no cluster structure,
    // so neighbors scatter across every cell): nprobe = nlist and a
    // wide shortlist are what exactness costs here, verified diff=0 vs
    // exact at sf0.01 AND sf0.1 (tools/ProbeQ64; shortlist=100 left 2
    // stragglers at sf0.1, 200 clears both). The cell-join machinery
    // exercised is identical at any nprobe; the recall/nprobe trade on
    // its own is pinned in PqSpec.
    "q64_ivfpq_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val pq = pq16(s, d)
      val ivf = graft.ann.IvfIndex(nlist = 16, nprobe = 16, seed = 42L).fit(e)
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val shortlist = pq.knnJoinIvf(ivf, e, queries, topK = 200)
        .select("query_id", "neighbor_id")
      pq.refine(shortlist, e, queries, topK = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ANN recall gate: makes approximate-backend quality visible in the
    // driver's CORRECTNESS gate, not only in ScalaTest. Top-k ANN output
    // can't hash-match an oracle (probabilistic result sets — q25/q26/
    // q35/q36/q37/q39 are rows-only by design), but the property that
    // matters — recall@10 vs the exact oracle crossing a per-backend
    // floor — IS a deterministic bit for these seeded builds, so each
    // backend emits one (backend, recall_ok) row and the oracle pins the
    // constant truth. Floors sit ~0.05 under the measured sf0.01 values
    // (tools/ProbeRecall: traversal .960, self_bucketed .806,
    // distributed .840, ivf .616, mllib_lsh .940, pq_adc .818); a
    // regression dropping any backend below its floor flips its bit and
    // hash-mismatches. The whole gate is ONE lazy plan (a union of
    // count-aggregates over hits joins) — no driver-side comparisons.
    "q83_ann_recall_gate" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val exact = KnnExact.knnBatch(e, queries, 10).select("query_id", "neighbor_id")
      def gate(name: String, floor: Double, got: DataFrame): DataFrame =
        got.select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("__hits"))
          .crossJoin(exact.agg(count(lit(1)).as("__total")))
          .select(lit(name).as("backend"),
            (col("__hits") / col("__total") >= lit(floor)).cast("int").as("recall_ok"))
      val forest = forest50(s, d)
      val dist = dforest50(s, d)
      val pq = pq16(s, d)
      gate("traversal", 0.90, forest.searchBatch(queries, 10))
        .unionByName(gate("self_bucketed", 0.75,
          forest.knnSelfJoinBucketed(e, topK = 10).filter(col("query_id") < 50)))
        .unionByName(gate("bucketed_spill", 0.93,
          forest.knnJoinBucketed(e, queries, topK = 10, querySpillEps = 0.25)))
        .unionByName(gate("distributed", 0.78,
          dist.knnJoin(queries, topK = 10)))
        .unionByName(gate("distributed_spill", 0.93,
          dist.knnJoin(queries, topK = 10, querySpillEps = 0.25)))
        .unionByName(gate("ivf", 0.55,
          ivf16x4(s, d).knnJoin(e, queries, topK = 10)))
        .unionByName(gate("mllib_lsh", 0.88,
          MlLsh.approxKnnJoin(e, queries, k = 10, maxDist = 1e9)))
        .unionByName(gate("pq_adc", 0.75,
          pq.knnJoin(pq.encode(e).select("vec_id", "pq_code"), queries, topK = 10)))
        .orderBy(col("backend"))
    }),

    // int8 scalar quantization (the 4× compression path, trivial
    // decode). All arithmetic in DOUBLE, mirrored term-for-term by the
    // DuckDB oracle; code lanes are integer-exact.
    "q65_sq8_codes" -> ((s, d) => {
      import graft.functions.VectorFunctions
      val e = Tables.embeddings(s, d)
      val withScale = e.select(col("vec_id"),
        VectorFunctions.sq8Scale(col("embedding")).as("scale"),
        col("embedding"))
      val codes = VectorFunctions.sq8Codes(col("embedding"), col("scale"))
      // scale is NOT rounded: it is one max + one divide over doubles
      // that are bit-identical on both engines (see the verify skill's
      // rounding gotcha — per-row rounding is where HALF_UP/HALF_EVEN
      // tie divergence lives, unrounded identical arithmetic is safe)
      withScale.filter(col("scale") > 0)
        .select(
          col("vec_id"),
          col("scale").as("qscale"),
          aggregate(codes, lit(0L), (a, v) => a + v).as("sum_code"),
          array_max(codes).as("max_code"),
          array_min(codes).as("min_code"))
        .orderBy(col("vec_id"))
    }),

    // Z-order layout codes (the multi-dimensional data-skipping story,
    // Sinks.parquetZOrdered): Morton interleave as pure Catalyst bit
    // arithmetic, integer-exact against a DuckDB list-fold mirror.
    "q66_zorder_codes" -> ((s, d) => {
      val p = Tables.part(s, d)
      p.select(col("p_partkey"),
          graft.sources.Sinks.mortonCode2(
            col("p_partkey") % 65536, col("p_size"), bits = 16).as("zcode"))
        .orderBy(col("p_partkey"))
    }),

    // MLlib interop backend: BucketedRandomProjectionLSH approximate
    // k-NN join (random projections, f64 — SURVEY §1.4).
    "q36_mllib_lsh_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      MlLsh.approxKnnJoin(e, queries, k = 5, maxDist = 1e9)
        .orderBy(col("query_id"), col("rank"))
    }),

    // S1: fastText .vec text-format scan (the reference's own fixture).
    "q27_vec_scan" -> ((s, _) => {
      VecReader.read(s, "/root/reference/data/test.vec", dim = 300)
        .select(col("id"), col("word"), size(col("embedding")).as("dim"))
        .orderBy(col("id"))
    }),

    // ---- Near-dup dedup extensions (documents) ----

    // MinHash+LSH banded near-dup (scale path; candidate recall asserted
    // vs q32's exact pairs in TextDedupSpec).
    "q30_minhash_pairs" -> ((s, d) => {
      TextDedup.minhashPairs(Tables.documents(s, d), "doc_id", "text",
        ngram = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jac"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash 64-bit fingerprints + near-dup pairs by Hamming radius.
    // Banded (pigeonhole) pair generation — band-equality self-join +
    // exact Hamming verify, never all-pairs; output EQUALS the brute
    // cross join (TextDedupSpec pins the equivalence).
    "q31_simhash_pairs" -> ((s, d) =>
      TextDedup.simhashPairsBanded(Tables.documents(s, d), "doc_id", "text",
          ngram = 2, maxHamming = 8)
        .orderBy(col("id_a"), col("id_b"))),

    // Exact n-gram Jaccard near-dup pairs (the oracle for q30).
    "q32_jaccard_pairs" -> ((s, d) => {
      TextDedup.jaccardPairsExact(Tables.documents(s, d), "doc_id", "text",
        ngram = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jac"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Near-dup clusters: connected components over the exact-Jaccard
    // edges (min-label propagation) — the dedup *decision* step.
    "q38_dedup_clusters" -> ((s, d) => {
      val pairs = TextDedup.jaccardPairsExact(
        Tables.documents(s, d), "doc_id", "text", 3, 0.5)
      DedupClusters.components(pairs)
        .select(col("node").as("doc_id"), col("cluster"))
        .orderBy(col("doc_id"))
    }),

    // q110: leakage-safe split — near-dup cluster members share a
    // split (the guard a per-doc random split can't give); assignment
    // is exact 64-bit modular arithmetic on the cluster label, so the
    // whole pipeline (pairs -> components -> split) hash-matches SQL.
    "q110_leakage_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.jaccardPairsExact(docs, "doc_id", "text", 3, 0.5)
      DedupClusters.leakageSafeSplit(docs, "doc_id",
          DedupClusters.components(pairs), trainPct = 80)
        .orderBy(col("doc_id"))
    }),

    // q118: compression-ratio quality signal — deflate(6) bytes over
    // raw bytes per doc (repetitive/templated text compresses far
    // below prose). Deterministic narrow UDF; zlib output is not
    // SQL-reproducible -> rows-only check, behavior in TextAnalysisSpec.
    "q118_compress_quality" -> ((s, d) => {
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          round(TextAnalysis.compressionRatio(col("text")), 4).as("deflate_ratio"))
        .orderBy(col("doc_id"))
    }),

    // q117: REAL BPE tokenization — merge table trained on the corpus
    // word-type histogram (distributed count + heap-pruned cap; driver
    // merge loop over the bounded histogram — the HF/sentencepiece
    // split), then per-doc segment counts under the broadcast merges.
    // Iterative global-argmax training is not SQL-expressible ->
    // rows-only driver check; merge sequence, tie determinism, and
    // encode algebra are pinned in BpeSpec.
    "q117_bpe_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.operators.Bpe.fit(docs, "text", numMerges = 50)
      docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_words"),
          graft.operators.Bpe.segmentCount(col("text"), merges).as("n_bpe"))
        .orderBy(col("doc_id"))
    }),

    // q119: BPE token IDS under the COMMITTED tokenizer asset
    // (BpeAssets: train-once merges + contiguous-id vocab) — the
    // trainable output of the tokenizer, stable across scale factors
    // because the asset is fixed. Narrow UDF encode, posexploded to
    // scalar (doc_id, pos, token_id) rows; the DuckDB oracle REPLAYS
    // the merge table with a recursive CTE (leftmost-occurrence
    // merging per rank ≡ the single greedy pass, since a pair merge
    // can never create a new instance of the same pair), generated
    // from the same committed constants.
    "q119_bpe_token_ids" -> ((s, d) => {
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(graft.operators.Bpe.encodeIds(
            col("text"), BpeAssets.merges, BpeAssets.vocabMap)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // q124: token-id PACKING — the step after tokenization in a
    // pretraining pipeline: each doc's id stream chunked into fixed
    // 64-token training examples (doc-bounded, like q91's char
    // chunker but over real token ids). Narrow encode + one groupBy
    // agg; chunks are summarized by exact integers (count +
    // position-weighted checksum) so the oracle — the q119 recursive
    // CTE regrouped — hash-matches without array columns.
    "q124_pack_token_ids" -> ((s, d) => {
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(graft.operators.Bpe.encodeIds(
            col("text"), BpeAssets.merges, BpeAssets.vocabMap)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
        .groupBy(col("doc_id"), expr("pos div 64").as("chunk_idx"))
        .agg(count(lit(1)).as("n_tokens"),
          sum((col("pos") % 64 + 1) * col("token_id")).as("checksum"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // q127: the STATEFUL-streaming funnel face run in batch mode —
    // flatMapGroupsWithState per-user state machine (next stage +
    // previous completion time), provably equal to the chained-min
    // batch operator under in-order processing; the driver gate runs
    // it against q113's oracle, so the incremental codepath must
    // reproduce the declarative one's exact counts.
    "q127_funnel_stateful" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_type"))
        .as[graft.streaming.FunnelEvent]
      graft.streaming.FunnelStream.report(
          graft.streaming.FunnelStream
            .completions(ev, Seq("view", "click", "purchase")).toDF(),
          Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    }),

    // q128: heavy hitters under a count-min cross-check — exact top-20
    // corpus tokens (SQL-mirrorable truth) each carrying cms_ok = the
    // sketch's overestimate-bounded guarantee (true ≤ est ≤ true+eps·N,
    // never an undercount). The sketch pass is a narrow scan + driver
    // merge of fixed-size counters — the 100 TB frequency-estimation
    // path — and the hash gate pins its error contract row by row.
    "q128_heavy_hitters" -> ((s, d) => {
      TextAnalysis.heavyHittersChecked(Tables.documents(s, d), "text", k = 20)
        .orderBy(col("cnt").desc, col("token"))
    }),

    // q129: retrieval EVALUATION — recall/MRR/nDCG of the cosine
    // ranking judged against euclidean-nearest qrels (graded 3/2/1)
    // over the embeddings, per query. The rankings are heap-pruned
    // (TopKPerKey), the metric math is rank-pure (score values never
    // enter the output), and every formula mirrors in SQL -> full
    // oracle for the evaluation harness itself.
    "q129_retrieval_eval" -> ((s, d) => {
      import graft.functions.VectorFunctions.{cosine, sqEucDist}
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val wide = GraftSession.widen(e).crossJoin(broadcast(q))
      val results = graft.plans.TopKPerKey.rankedTopK(
          wide.select(col("qid"), col("vec_id").as("doc_id"),
            negate(cosine(col("embedding"), col("qvec"))).as("__negsc")),
          "qid", Seq("__negsc", "doc_id"), 5)
        .select(col("qid"), col("doc_id"), col("rank"))
      val truth = graft.plans.TopKPerKey.rankedTopK(
          wide.select(col("qid"), col("vec_id").as("doc_id"),
            sqEucDist(col("embedding"), col("qvec")).as("__dist")),
          "qid", Seq("__dist", "doc_id"), 3)
        .select(col("qid"), col("doc_id"), (lit(4) - col("rank")).cast("double").as("grade"))
      graft.operators.RetrievalEval.metrics(results, truth, k = 5)
        .orderBy(col("qid"))
    }),

    // q130: ANN quality under the DRIVER gate — the forest's serving
    // recall measured through the RetrievalEval harness against the
    // exact ranking as graded qrels, reported as invariant thresholds
    // (q104-style component/ok rows; the raw recall is seeded but
    // statistical, so the gate pins FLOORS, not values). A recall or
    // ranking regression now flips the correctness table, not just a
    // spec.
    "q130_ann_quality_gate" -> ((s, d) => {
      import graft.functions.VectorFunctions
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val model = forest50(s, d)
      val results = model.knnJoinBucketed(e, queries, topK = 10)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"), col("rank"))
      val truth = graft.operators.KnnExact.knnBatch(e, queries, 10)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
          (lit(11) - col("rank")).cast("double").as("grade"))
      val m = graft.operators.RetrievalEval.metrics(results, truth, k = 10)
        .agg(avg(col("recall")).as("r"), avg(col("mrr")).as("m"), avg(col("ndcg")).as("n"))
        .head()
      import s.implicits._
      Seq(
        ("mrr_self_exact", if (m.getDouble(1) == 1.0) 1 else 0),
        ("ndcg10_floor_085", if (m.getDouble(2) >= 0.85) 1 else 0),
        ("recall10_floor_080", if (m.getDouble(0) >= 0.80) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q131: REAL multi-frame VIDEO decode under the hash gate — the
    // animated-GIF analog of q90/q120: deterministic gray clips are
    // encoded as actual multi-frame GIFs (javax.imageio sequence
    // writer) and decoded back by the production gifVideoStats path;
    // every lane is an exact integer (frame count, dims, gray sum,
    // inter-frame motion), so the oracle replays the pixel formula
    // without touching a codec. Upgrades video from byte-stats stub to
    // a real multi-frame codec path.
    "q131_gif_video" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      GraftSession.widen(docs)
        .withColumn("payload", Multimodal.syntheticGif(col("doc_id")))
        .select(col("doc_id").as("media_id"),
          Multimodal.gifVideoStats(col("payload")).as("st"))
        .select(col("media_id"),
          col("st._1").as("n_frames"), col("st._2").as("width"),
          col("st._3").as("height"), col("st._4").as("sum_gray"),
          col("st._5").as("motion"))
        .orderBy(col("media_id"))
    }),

    // q132: duplicated-span REMOVAL (keep-first) — the scrub stage of
    // exact substring dedup (q76 only measures): consecutive 8-token
    // segments, corpus-wide first occurrence survives, later repeats
    // drop. One segment-keyed argmin agg (no window), md5 of the
    // rebuilt text per doc under the q67 full-output-compare
    // discipline.
    "q132_dup_span_removal" -> ((s, d) => {
      graft.operators.TextDedup.removeDupSpans(
          Tables.documents(s, d), "doc_id", "text", window = 8)
        .orderBy(col("doc_id"))
    }),

    // q133: INCREMENTAL token counts — the streaming face of the
    // corpus histogram (q128's exact path): documents fold into a
    // log-structured counter store in 5 micro-batches (per-batch cost
    // = batch vocabulary, nothing corpus-sized), the store compacts
    // (one row per token), and the served top-20 must equal a full
    // recount — sum-of-deltas exactness under the driver's hash gate,
    // independent of batching.
    "q133_freq_stream" -> ((s, d) => {
      import graft.streaming.FreqStream
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      FreqStream.replayInBatches(docs, "q133_freq", nBatches = 5)
      FreqStream.compact(s, "q133_freq")
      FreqStream.topK(s, "q133_freq", 20)
    }),

    // q134: REAL video frame SAMPLING — every 2nd frame of each
    // multi-frame GIF clip is decoded (unsampled frames never
    // rasterize: decode cost follows the sample) and emitted as one
    // row with its exact integer gray sum; the keyframe-extraction
    // shape of a multimodal training pipeline, under the same
    // closed-form hash gate as q131.
    "q134_gif_frame_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      GraftSession.widen(docs)
        .withColumn("payload", Multimodal.syntheticGif(col("doc_id")))
        .select(col("doc_id").as("media_id"),
          explode(Multimodal.gifSampleFrames(col("payload"), stride = 2)).as("fr"))
        .select(col("media_id"), col("fr.frame_idx"), col("fr.width"),
          col("fr.height"), col("fr.gray_sum"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // q135: TOKEN-budget data mixing — the mixing primitive as
    // production specifies it ("x tokens of web, y of code"), not doc
    // counts (q49) or keep rates (q72): per language, keep the maximal
    // deterministic-hash-order prefix whose token total fits the
    // budget. Two-resolution cumsum (bucket-level agg + one straddling
    // bucket per group at document level) so no group is ever fully
    // sorted; the oracle is the single-window formulation.
    "q135_token_budget_mix" -> ((s, d) => {
      graft.operators.WeightedSample.tokenBudgetSample(
          Tables.documents(s, d), "lang", "doc_id",
          size(split(lower(trim(col("text"))), "\\s+")).cast("long"),
          Map("en" -> 5000L, "de" -> 1500L, "es" -> 2000L,
            "fr" -> 1000L, "zh" -> 2500L),
          buckets = 1024)
        .orderBy(col("lang"), col("doc_id"))
    }),

    // q136: JSONL source under the hash gate — the interchange format
    // scraped corpora arrive in: the documents table is written out as
    // REAL newline-delimited JSON files and read back through the
    // explicit-schema + corrupt-record-capture ingest path; the oracle
    // reads the parquet original, so any escaping/unicode/number-width
    // loss in either JSON direction breaks the hash.
    "q136_jsonl_roundtrip" -> ((s, d) => {
      import graft.sources.JsonlSource
      val path = "/tmp/graft_q136_jsonl"
      JsonlSource.write(Tables.documents(s, d), path)
      JsonlSource.readDocumentsClean(s, path)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // q170: the CSV face of the q136 losslessness contract — the
    // documents table written as real headered, fully-quoted CSV
    // (pinned dialect: doubled-quote escapes, explicit null token,
    // empty-vs-null kept apart) and read back through the explicit-
    // schema PERMISSIVE path; the oracle compares against the parquet
    // original, so any quoting/escaping/null-collapse loss breaks the
    // hash.
    "q170_csv_roundtrip" -> ((s, d) => {
      import graft.sources.CsvSource
      val path = "/tmp/graft_q170_csv"
      CsvSource.write(Tables.documents(s, d), path)
      CsvSource.readDocumentsClean(s, path)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // q159: STRIDED training chunks — overlapping windows (len 64,
    // stride 32), the HF-style context-stride packer for causal-LM
    // data: every token also appears in the window that begins
    // mid-context, so no prediction ever lacks its left context.
    // Window-free: each token computes its own [kmin, kmax] chunk
    // range (all-positive arithmetic — Spark `div` truncates where
    // DuckDB `//` floors, identical only above zero) and explodes a
    // ≤ ⌈len/stride⌉ fan-out; same integer chunk summaries as q124.
    "q159_stride_chunks" -> ((s, d) => {
      val L = 64; val S = 32
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(graft.operators.Bpe.encodeIds(
            col("text"), BpeAssets.merges, BpeAssets.vocabMap)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
        .withColumn("kmin",
          when(col("pos") < L, lit(0L))
            .otherwise(expr(s"(pos - $L + $S) div $S")))
        .withColumn("chunk_idx",
          explode(sequence(col("kmin"), expr(s"pos div $S"))))
        .groupBy(col("doc_id"), col("chunk_idx"))
        .agg(count(lit(1)).as("n_tokens"),
          sum((col("pos") - col("chunk_idx") * S + 1) * col("token_id"))
            .as("checksum"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // q160: STREAMING index maintenance — q146's delta algebra driven
    // through the round-8 `IndexMaintenance.applyUpserts` face (the
    // exact code `maintainStream`'s foreachBatch runs per micro-batch;
    // IndexMaintenanceSpec pins stream ≡ replay). Three upsert waves:
    // adds, then adds + in-place CHANGES + explicit DELETE markers
    // (null text), then more adds — classified per batch by
    // SnapshotDiff over the standing fingerprint log, applied via
    // tombstone removes / delta appends / forced compaction on change.
    // The oracle computes fresh BM25 over the final live corpus from
    // scratch: the hash gate proves continuously-maintained ≡ rebuilt.
    "q160_stream_maintain" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val changed = pmod(col("doc_id"), lit(3)) === 0 &&
        pmod(col("doc_id"), lit(5)) === 0
      val deleted = pmod(col("doc_id"), lit(3)) === 0 &&
        pmod(col("doc_id"), lit(7)) === 0 && pmod(col("doc_id"), lit(5)) =!= 0
      // TWO waves (r12 trim — was three): the edited/deleted ids are
      // all ≡ 0 mod 3, so folding the former third add wave into the
      // first leaves the schedule semantics (adds before their edits/
      // deletes) and the final index state — hence the oracle —
      // unchanged, one applyUpserts wave cheaper
      val waves = Seq(
        docs.filter(pmod(col("doc_id"), lit(3)) =!= 1),
        docs.filter(pmod(col("doc_id"), lit(3)) === 1)
          .unionByName(docs.filter(changed)
            .withColumn("text", concat(col("text"), lit(" v2"))))
          .unionByName(docs.filter(deleted)
            .withColumn("text", lit(null).cast("string"))))
      graft.streaming.IndexMaintenance.initStores(s, "graft_q160_idx")
      waves.zipWithIndex.foreach { case (b, k) =>
        graft.streaming.IndexMaintenance.applyUpserts(
          s, "graft_q160_idx", b, ver = k + 1L, buckets = 8)
      }
      val probeTerms = docs.filter(col("doc_id") === 1)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("t"))
        .distinct().collect().map(_.getString(0)).toSeq
      graft.operators.Bm25.scoreIndexed(s, "graft_q160_idx", probeTerms)
        .select(col("doc_id"), col("n_matched"), round(col("bm25"), 4).as("bm25"))
        .orderBy(col("doc_id"))
    }),

    // q158: dedup-impact dashboard — one (metric, value) report of how
    // much duplication each lens sees: exact byte-dups, verified
    // near-dup pairs (the banded LSH mine == the exact Jaccard set),
    // docs implicated in clusters, mean duplicated-span ratio. The
    // before-picture a corpus owner reads to pick which dedup stage is
    // worth its shuffle.
    "q158_dedup_dashboard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.minhashPairs(docs, "doc_id", "text",
        ngram = 3, numHashes = 32, bands = 8, threshold = 0.5).localCheckpoint()
      def one(metric: String, v: org.apache.spark.sql.Column, src: DataFrame) =
        src.agg(v.cast("double").as("value"))
          .select(lit(metric).as("metric"), col("value"))
      // n_docs and exact_dup_docs share ONE corpus scan+agg, unpivoted
      val docStats = docs
        .agg(count(lit(1)).cast("double").as("n_docs"),
          (count(lit(1)) - countDistinct(col("text"))).cast("double")
            .as("exact_dup_docs"))
        .select(explode(array(
          struct(lit("n_docs").as("metric"), col("n_docs").as("value")),
          struct(lit("exact_dup_docs").as("metric"),
            col("exact_dup_docs").as("value")))).as("kv"))
        .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
      docStats
        .unionByName(one("neardup_pairs", count(lit(1)), pairs))
        .unionByName(one("docs_in_neardup", countDistinct(col("id")),
          pairs.select(col("id_a").as("id"))
            .unionByName(pairs.select(col("id_b").as("id")))))
        .unionByName(one("mean_dup_span_ratio",
          round(avg(col("dup_ratio")), 6),
          TextDedup.dupShingleStats(docs, "doc_id", "text", ngram = 3)))
        .orderBy(col("metric"))
    }),

    // q157: NB classifier confusion matrix (resubstitution — scored on
    // its own training corpus, stated plainly): q141's pred vs the
    // label, per cell. The honesty check on the distilled filter: a
    // degenerate prior-dominated model shows up here as an all-one-
    // class column before it silently routes a corpus.
    "q157_nb_confusion" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = TextAnalysis.nbClassifierScores(docs, "doc_id", "text",
        coalesce(col("lang") === "en", lit(false)))
      docs.select(col("doc_id"),
          coalesce(col("lang") === "en", lit(false)).cast("int").as("label"))
        .join(scored.select(col("doc_id"), col("pred")), "doc_id")
        .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("pred"))
    }),

    // q156: quality-threshold sweep — (docs, tokens) surviving each
    // candidate quality cutoff, in one narrow pass. The curve a corpus
    // owner reads before committing to a filter setting (the padding-
    // curve discipline applied to quality filtering).
    "q156_quality_sweep" -> ((s, d) => {
      TextAnalysis.qualityThresholdSweep(Tables.documents(s, d), "text")
        .orderBy(col("thr"))
    }),

    // q155: temperature-scaled source mixing (mT5-style α-sampling) —
    // per-source weights n^α/Σn^α at α = 0.7 and the integer targets a
    // 10k-doc sample would draw. Group-cardinality-sized throughout;
    // floor (not round) keeps targets tie-divergence-free.
    "q155_temperature_mix" -> ((s, d) => {
      graft.operators.WeightedSample.temperatureWeights(
          Tables.documents(s, d), "source", alpha = 0.7, sampleTotal = 10000L)
        .orderBy(col("source"))
    }),

    // q154: language-ID confusion matrix — the eval surface for the
    // heuristic classifier: predicted (stopword-vote languageId) vs
    // the metadata label, counted per cell. One narrow projection +
    // one partial-aggregated groupBy; the standard report before
    // trusting any cheap classifier as a corpus router.
    "q154_lang_confusion" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.languageId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    // q153: PII audit — the inventory side of q67's scrub: one row per
    // occurrence with its type and matched text, extracted under the
    // same email→ip→phone precedence as redaction (digit runs inside
    // an address can never double-report as a phone). Same salt as
    // q67, so every doc contributes one of each type.
    "q153_pii_audit" -> ((s, d) => {
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1 555 01"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
        lit(" 3456 from 10.2."), pmod(col("doc_id"), lit(256)), lit(".7"))
      TextAnalysis.piiMatches(
          Tables.documents(s, d).select(col("doc_id"), aug.as("t")),
          "doc_id", "t")
        .orderBy(col("doc_id"), col("pii_type"), col("hit"))
    }),

    // q152: quality-decile routing WITHOUT a window — quantile
    // thresholds from one aggregation (broadcast 1-row), per-row
    // bucket by comparison against the tiny threshold array. The
    // window-ntile alternative sorts the corpus in one task; this
    // stays narrow at any scale (curriculum bucketing's real shape).
    "q152_quantile_buckets" -> ((s, d) => {
      TextAnalysis.quantileBuckets(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          "n_chars", n = 10)
        .orderBy(col("doc_id"))
    }),

    // q151: pipeline-funnel accounting — the curation pipeline's own
    // funnel, in ONE declarative plan: raw → normalize (non-empty) →
    // token-length floor → exact dedup (first-seen-wins on normalized
    // text) → leakage-free hash train split, with (docs, tokens)
    // accounted at every stage. This is the per-drop report a corpus
    // owner reads before training; every stage reuses a gated
    // primitive (q144 normalize, q23-style dedup, q47 split).
    "q151_pipeline_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val norm = docs
        .withColumn("ntext", TextAnalysis.normalizeText(col("text")))
        .filter(length(col("ntext")) > 0)
      val lenf = norm.filter(TextAnalysis.tokenCount(col("ntext")) >= 10)
      val dedup = lenf.groupBy(col("ntext"))
        .agg(min(col("doc_id")).as("doc_id"))
      val train = dedup.filter(
        graft.operators.WeightedSample.portableHash(col("doc_id")) % 100 < 90)
      def acct(df: DataFrame, idx: Int, stage: String, textCol: String) =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(TextAnalysis.tokenCount(col(textCol))), lit(0))
              .cast("long").as("n_tokens"))
          .select(lit(idx).as("stage_idx"), lit(stage).as("stage"),
            col("n_docs"), col("n_tokens"))
      acct(docs, 1, "raw", "text")
        .unionByName(acct(norm, 2, "normalized", "ntext"))
        .unionByName(acct(lenf, 3, "len_floor", "ntext"))
        .unionByName(acct(dedup, 4, "dedup", "ntext"))
        .unionByName(acct(train, 5, "train", "ntext"))
        .orderBy(col("stage_idx"))
    }),

    // q150: vector-store drop sync — the embedding-side sibling of
    // q146: standing forest built on the OLD embedding drop, a
    // SnapshotDiff on the VECTOR column classifies the new drop,
    // remove(removed ∪ changed) + append(added ∪ changed) bring the
    // store current without a rebuild. The audit is exact store
    // geometry (rows = members × trees, routing's forced-leaf guard
    // places every vector) + recounted clean/appeared bits.
    "q150_vector_drop_sync" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val old = e.filter(pmod(col("vec_id"), lit(7)) =!= 0)
      val neu = e.filter(pmod(col("vec_id"), lit(11)) =!= 0)
        .withColumn("embedding",
          when(pmod(col("vec_id"), lit(5)) === 0,
            transform(col("embedding"), x => x * lit(2.0f)))
            .otherwise(col("embedding")))
      val model = graft.ann.DistributedAnnForest(
        numTrees = 8, maxLeafSize = 5, maxDepth = 16).fit(old)
      val before = model.corpusBuckets.count()
      val delta = graft.operators.SnapshotDiff.diff(
        old, neu, "vec_id", Seq("embedding")).localCheckpoint()
      val gone = delta.filter(col("status").isin("removed", "changed"))
        .select(col("vec_id"))
      val fresh = neu.join(delta.filter(col("status").isin("added", "changed"))
        .select(col("vec_id")), Seq("vec_id"), "left_semi")
      val synced = model.remove(gone, "vec_id").append(fresh).compact()
      val after = synced.corpusBuckets.count()
      // changed ids are legitimately BACK (removed then re-added with
      // the revised vector) — the no-residual proof is for ids that
      // left and never returned
      val goneResidual = synced.corpusBuckets
        .join(delta.filter(col("status") === "removed")
          .select(col("vec_id").as("neighbor_id")), Seq("neighbor_id"))
        .count()
      val appearedIds = synced.corpusBuckets
        .join(fresh.select(col("vec_id").as("neighbor_id")), Seq("neighbor_id"))
        .select(col("neighbor_id")).distinct().count()
      val freshCount = fresh.count()
      import s.implicits._
      Seq((before, after, if (goneResidual == 0) 1 else 0,
        if (appearedIds == freshCount) 1 else 0))
        .toDF("n_before", "n_after", "clean", "appeared")
    }),

    // q149: padding-waste curve — what length-bucketed batching at
    // widths {1,8,16,32,global} costs in padded tokens over the
    // documents corpus. One narrow pass, two partial aggs; the knee of
    // this curve picks the serving batcher's bucket width.
    "q149_padding_curve" -> ((s, d) => {
      graft.operators.Packing.paddingWasteCurve(
          Tables.documents(s, d), "text")
        .orderBy(col("bucket_width"))
    }),

    // q148: join-size pre-flight — count-min inner product estimates
    // |lineitem ⋈ orders| from two (depth × width)-row sketch tables;
    // exact join count is the fixture truth, the sketch bits are the
    // pinned estimator guarantees (never under; over by > e·N_a·N_b/w
    // w.p. ≤ e^-depth). The q128/q137 sketch discipline, applied to
    // join planning.
    "q148_join_size" -> ((s, d) => {
      graft.operators.SkewJoin.joinSizeChecked(
          Tables.lineitem(s, d), Tables.orders(s, d),
          "l_orderkey", "o_orderkey")
        .select(col("n_a"), col("n_b"), col("exact_join_rows"),
          col("never_under"), col("bound_ok"))
    }),

    // q147: key-skew pre-flight over the biggest fact table — per-key
    // counts (one partial agg) + one summary agg over the key-sized
    // count table. skew_ratio and the count quantiles are the numbers
    // that pick plain-shuffle vs AQE-split vs salted join BEFORE a
    // 100 TB join launches.
    "q147_skew_report" -> ((s, d) => {
      graft.operators.SkewJoin.describeSkew(
          Tables.lineitem(s, d), Seq("l_suppkey"))
        .orderBy(col("metric"))
    }),

    // q146: INCREMENTAL index maintenance between corpus drops — build
    // the standing BM25 index on the OLD drop, take the SnapshotDiff
    // delta to the NEW drop, apply it (removeDocs removed ∪ changed →
    // compactIndex → appendDocs added ∪ changed), then SERVE. The
    // oracle computes fresh BM25 over the new drop from scratch: the
    // hash gate is the proof that delta-maintained ≡ rebuilt, weight
    // for weight (integer tf/df/dl/N and one avgdl division).
    "q146_incremental_index" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val neu = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.Bm25.buildIndex(old, "graft_q146_idx", buckets = 8)
      val delta = graft.operators.SnapshotDiff.diff(
        old, neu, "doc_id", Seq("text")).localCheckpoint()
      graft.operators.Bm25.removeDocs(s, "graft_q146_idx",
        delta.filter(col("status").isin("removed", "changed")).select(col("doc_id")))
      graft.operators.Bm25.compactIndex(s, "graft_q146_idx", buckets = 8)
      graft.operators.Bm25.appendDocs(s, "graft_q146_idx",
        neu.join(delta.filter(col("status").isin("added", "changed"))
          .select(col("doc_id")), Seq("doc_id"), "left_semi"),
        buckets = 8)
      val probeTerms = neu.filter(col("doc_id") === 1)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("t"))
        .distinct().collect().map(_.getString(0)).toSeq
      graft.operators.Bm25.scoreIndexed(s, "graft_q146_idx", probeTerms)
        .select(col("doc_id"), col("n_matched"), round(col("bm25"), 4).as("bm25"))
        .orderBy(col("doc_id"))
    }),

    // q145: contrastive triplets for embedding training — near-dup
    // pairs (the q30 LSH mine, == the exact Jaccard set) symmetrized
    // into anchors/positives, negatives drawn by a deterministic Knuth
    // mix mod the id space (the q47 discipline — no RNG, SQL-mirror-
    // able), flagged when the draw collides with the anchor's own
    // cluster. The oracle replays pairs AND draw arithmetic exactly.
    "q145_contrastive_triplets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      val pairs = TextDedup.minhashPairs(docs, "doc_id", "text",
        ngram = 3, numHashes = 32, bands = 8, threshold = 0.5)
      graft.operators.Contrastive.tripletsFromPairs(
          pairs, docs, "doc_id", maxId)
        .orderBy(col("anchor_id"), col("pos_id"))
    }),

    // q144: canonical text normalization under the hash gate — fixture
    // text is salted with the pathologies the pass exists for
    // (decomposed e+combining-acute, a BEL control char, a zero-width
    // space, doubled blanks); NFC + zero-width strip + control→space +
    // whitespace collapse must produce byte-identical output to
    // DuckDB's nfc_normalize + the same three regexp passes. Narrow
    // per-row map, no shuffle (PlanSpec-style claim in the scaladoc).
    "q144_normalize_text" -> ((s, d) => {
      val dirty = concat(col("text"), lit(" caf"), lit("e\u0301"),
        lit("\u0007"), lit("x"), lit("\u200B"), lit("y  z"))
      Tables.documents(s, d)
        .select(col("doc_id"), dirty.as("__dirty"))
        .select(col("doc_id"),
          TextAnalysis.normalizeText(col("__dirty")).as("norm_text"),
          length(col("__dirty")).as("n_before"))
        .withColumn("n_after", length(col("norm_text")))
        .orderBy(col("doc_id"))
    }),

    // q143: takedown propagation — ONE purge list driven through every
    // standing store (forest buckets + BM25 index) by Takedown.purgeAll,
    // audited by recounting the stores themselves. n_before/n_after are
    // exact store sizes the oracle derives from the corpus (dedup
    // survivors × trees; distinct indexed docs); clean recounts
    // residual references post-purge (must be 0 → bit 1).
    "q143_takedown" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val e = Tables.embeddings(s, d)
      val purge = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
        .select(col("doc_id").as("id"))
      graft.operators.Bm25.buildIndex(docs, "graft_q143_bm25", buckets = 8)
      val ann = graft.ann.DistributedAnnForest(
        numTrees = 8, maxLeafSize = 5, maxDepth = 16).fit(e)
      val (_, audit) = graft.operators.Takedown.purgeAll(
        s, purge, Some(ann), Some("graft_q143_bm25"), None, bm25Buckets = 8)
      audit.orderBy(col("store"))
    }),

    // q142: snapshot diff between two corpus versions — one full-outer
    // id join (exchange-free over bucketed snapshots), null-safe
    // content struct compare. Old drop = ids ∉ 7ℤ; new drop = ids ∉
    // 11ℤ with every 5th doc's text revised → all four statuses appear
    // and each is closed-form checkable.
    "q142_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldDrop = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val newDrop = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.SnapshotDiff.diff(
          oldDrop, newDrop, "doc_id", Seq("text", "lang", "source"))
        .orderBy(col("doc_id"))
    }),

    // q141: a quality/language classifier TRAINED in-engine — add-one
    // multinomial Naive Bayes over tokens, labels straight from the
    // lang column (distilling a cheap fastText-style filter from
    // metadata you already have). Exact-count training + closed-form
    // logs means train AND score sit under the hash gate — the model
    // is auditable, not just the output. Scores rounded 6dp, argmax
    // decided on the rounded values (q114 discipline).
    "q141_nb_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // coalesce: a null lang must be class 0 like the oracle's CASE,
      // not a null label that silently drops the doc from the counts
      TextAnalysis.nbClassifierScores(docs, "doc_id", "text",
          coalesce(col("lang") === "en", lit(false)))
        .orderBy(col("doc_id"))
    }),

    // q140: perceptual near-duplicate IMAGES under the hash gate —
    // group-structured synthetic PNGs (real codec), REAL ImageIO
    // decode → 64-bit dHash, then the banded Hamming self-join from
    // the SimHash path (perceptual dedup IS SimHash dedup over a
    // different fingerprint; exact band-then-verify, no all-pairs).
    // The oracle replays the pixel formula and the bit comparisons in
    // closed form, never touching a codec — q90's discipline applied
    // to perceptual dedup.
    "q140_phash_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      // duplicate-cluster size stays ~31 docs at EVERY corpus size
      // (real dup clusters don't grow with the corpus) → output is
      // Θ(n), not Θ(n²/groups); one count() action sizes the groups
      val groups = math.max((docs.count() / 31L).toInt, 1)
      val fp = GraftSession.widen(docs)
        .withColumn("payload", Multimodal.syntheticGroupPng(col("doc_id"), groups))
        .select(col("doc_id").as("id"),
          Multimodal.imageDHash(col("payload")).as("fp"))
        .localCheckpoint() // fingerprint once; decode is the dominant cost
      TextDedup.simhashPairsBandedFp(fp, maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q139: decontamination behind a broadcast Bloom prefilter — the
    // 100 TB shape of q69: the bench side's shingle hashes fold into a
    // ~KB Bloom sketch (one distributed pass), the corpus-sized train
    // side drops non-candidate shingles in a narrow codegen'd
    // might_contain filter BEFORE any shuffle, and the exact join runs
    // on survivors only. No false negatives → bit-identical to the
    // exact join → the full oracle, not a probabilistic gate.
    "q139_bloom_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextDedup.contaminationPairsBloom(
        docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        "doc_id", "text", ngram = 3, minFrac = 0.4)
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // q138: incremental drift monitoring from the standing counter
    // store — per arriving batch, KL(batch || corpus-so-far) scored
    // against the store as it folds in (batch 0 is exactly 0; a
    // distribution shift shows as a KL step without rescanning
    // history). The oracle replays the same cumulative references with
    // per-token window cumsums over the batch sequence.
    "q138_drift_stream" -> ((s, d) => {
      import graft.streaming.FreqStream
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      FreqStream.replayWithDrift(docs, "q138_freq", nBatches = 5)
        .orderBy(col("batch"))
    }),

    // q137: mergeable-sketch cardinality under the gate — per-source
    // exact distinct tokens cross-checked by DataSketches HLL
    // (error-bound bit) and by sketch MERGEABILITY (union of two
    // disjoint halves == one-shot sketch) — the property that makes
    // 100 TB cardinality incremental. Oracle = exact distinct + the
    // constant-truth bits (q128's discipline, applied to cardinality).
    "q137_distinct_sketch" -> ((s, d) => {
      graft.operators.TextAnalysis.distinctChecked(
          Tables.documents(s, d), "source", "doc_id", "text")
        .orderBy(col("source"))
    }),

    // q125: funnel conversion TIMING — per stage transition, converting
    // users + the exact integer sum of lags in micros (sum+count, not
    // avg: all-integer output, no float path). Same chained frames as
    // q113; per-pair join build side is the later (smaller) stage.
    "q125_funnel_timing" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      graft.operators.Funnel.conversionLags(ev, Seq("view", "click", "purchase"))
        .orderBy(col("from_stage"))
    }),

    // q126: tokenizer diagnostics — corpus frequency of every vocab
    // token under the committed BpeAssets tokenizer (the table an
    // embedding-init / rare-token-pruning pass reads). Top-50 by
    // frequency with a total-order tiebreak; oracle = the q119
    // generated CTE regrouped + the committed vocab VALUES.
    "q126_bpe_token_freq" -> ((s, d) => {
      val vocabDf = s.createDataFrame(BpeAssets.vocab).toDF("token", "token_id")
      GraftSession.widen(Tables.documents(s, d))
        .select(explode(graft.operators.Bpe.encodeIds(
          col("text"), BpeAssets.merges, BpeAssets.vocabMap)).as("token_id"))
        .groupBy(col("token_id")).agg(count(lit(1)).as("freq"))
        .join(broadcast(vocabDf), Seq("token_id"))
        .select(col("token_id"), col("token"), col("freq"))
        .orderBy(col("freq").desc, col("token_id")).limit(50)
    }),

    // q115: Zipf slope of the corpus rank-frequency curve — corpus
    // health metric (natural text ~ -1). Top-500 tokens via
    // TakeOrderedAndProject (heap-pruned), rank over the bounded 500,
    // then ONE regression aggregate: no corpus-wide window, the token
    // count agg is the only big shuffle.
    "q115_zipf_slope" -> ((s, d) => {
      val counts = GraftSession.widen(Tables.documents(s, d))
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(500)
      counts
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))))
        .agg(
          count(lit(1)).as("n_tokens_fit"),
          round(regr_slope(log(col("cnt")), log(col("rank"))), 4).as("slope"),
          round(regr_intercept(log(col("cnt")), log(col("rank"))), 4).as("intercept"))
    }),

    // q111: n-gram novelty vs a reference slice — fraction of each
    // doc's distinct shingles unseen in docs 0-99 (hash-shingles in
    // Spark, string shingles in the oracle: identical sets up to
    // 64-bit collisions, the q38 equivalence).
    "q111_novelty" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextDedup.noveltyVsReference(docs, docs.filter(col("doc_id") < 100),
          "doc_id", "text", ngram = 3)
        .orderBy(col("doc_id"))
    }),

    // Embedding-cosine near-dup pairs.
    "q33_cosine_pairs" -> ((s, d) => {
      TextDedup.cosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Brute-force cosine top-k (ANN baseline; ids+rank, hash-stable).
    // Heap-pruned: orderBy+limit plans as TakeOrderedAndProject
    // (per-partition bounded heaps), and the rank window only ever sees
    // the 10 surviving rows — the corpus is never globally windowed.
    "q34_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("__qvec"))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"), cosine(col("embedding"), col("__qvec")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy(col("rank"))
    }),

    // ---- Text analysis (documents) ----

    "q40_text_stats" -> ((s, d) => {
      val t = col("text")
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        length(t).as("text_chars"),
        TextAnalysis.meanTokenLen(t).as("mean_tok_len"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring + language ID + subword counting (heuristics —
    // deterministic but not SQL-expressible; rows-only driver check,
    // behavior asserted in TextAnalysisSpec).
    "q41_quality_lang" -> ((s, d) => {
      val t = col("text")
      GraftSession.widen(Tables.documents(s, d)).select(
        col("doc_id"),
        TextAnalysis.qualityScore(t).as("quality"),
        TextAnalysis.languageId(t).as("lang_pred"),
        TextAnalysis.languageIdCharNgram(t).as("lang_pred_ngram"),
        TextAnalysis.subwordCount(t).as("n_subwords"),
        TextAnalysis.fingerprint(t).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // The SQL-expressible slice of the text-quality suite, under a full
    // DuckDB oracle (unlike q41, whose fingerprint/subword columns are
    // regex-lookaround/xxhash constructs DuckDB can't mirror): token
    // count, punctuation ratio, stopword ratio, composite quality score,
    // stopword-vote language ID. All narrow codegen'd projections.
    "q42_quality_metrics" -> ((s, d) => {
      // tokenize ONCE per row: HOF expressions are CodegenFallback with
      // no CSE, so naive per-metric calls would re-expand the split
      // ~10×. CollapseProject keeps the multiply-referenced non-cheap
      // alias materialized; quality is derived from the emitted metric
      // columns (identical doubles — same ops, same order).
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("__toks"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"))
        .select(col("doc_id"),
          size(col("__toks")).as("n_tokens"),
          col("punct_ratio"),
          TextAnalysis.stopwordRatioT(col("__toks"), TextAnalysis.defaultStopwords)
            .as("stopword_ratio"),
          TextAnalysis.languageIdT(col("__toks")).as("lang_pred"))
        .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
          col("stopword_ratio"),
          TextAnalysis.qualityFromMetrics(
            col("n_tokens"), col("stopword_ratio"), col("punct_ratio")).as("quality"),
          col("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // PII scrub: email/IPv4/phone redaction. The synthetic corpus has
    // no PII, so the query plants deterministic PII derived from doc_id
    // (same concat on both engines) and md5-compares the full redacted
    // string — any regex-dialect divergence between Java regex and
    // DuckDB's RE2 fails the hash.
    "q67_pii_redact" -> ((s, d) => {
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1 555 01"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
        lit(" 3456 from 10.2."), pmod(col("doc_id"), lit(256)), lit(".7"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(TextAnalysis.redactPii(aug)).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition/shape filters. Lines are synthesized by
    // newline-injection (the fixture is single-line); every ratio is an
    // unrounded integer-ratio double — identical arithmetic on both
    // engines, and rounding is where HALF_UP/HALF_EVEN ties would
    // diverge (verify-skill gotcha).
    "q68_gopher_metrics" -> ((s, d) => {
      // tokenize and line-split ONCE per row (the q42 lesson: HOFs are
      // CodegenFallback with no CSE), then derive every metric and the
      // keep verdict from the materialized aliases
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          regexp_replace(col("text"), " table ", "\n").as("__aug"))
        .select(col("doc_id"), col("__aug"),
          TextAnalysis.docLines(col("__aug")).as("__ls"),
          TextAnalysis.tokens(col("__aug")).as("__toks"))
        .select(col("doc_id"),
          size(col("__ls")).as("n_lines"),
          TextAnalysis.dupLineRatioT(col("__ls")).as("dup_line_ratio"),
          TextAnalysis.symbolRatio(col("__aug")).as("symbol_ratio"),
          TextAnalysis.alphaTokenRatioT(col("__toks")).as("alpha_ratio"),
          size(col("__toks")).as("__ntok"),
          TextAnalysis.meanTokenLenT(col("__toks")).as("__meanlen"))
        .select(col("doc_id"), col("n_lines"), col("dup_line_ratio"),
          col("symbol_ratio"), col("alpha_ratio"),
          TextAnalysis.gopherKeepFromMetrics(
            col("__ntok"), col("__meanlen"), col("symbol_ratio"),
            col("dup_line_ratio"), col("alpha_ratio")).cast("int").as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: n-gram overlap join between the train
    // split and a held-out benchmark split (doc_id % 20). The standard
    // pre-training hygiene op — train docs covering a benchmark doc's
    // shingles are contamination hits.
    "q69_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextDedup.contaminationPairs(
        docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        "doc_id", "text", ngram = 3, minFrac = 0.5)
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // Deterministic train/val split — the curation primitive every
    // training pipeline needs. Knuth multiplicative hash of the id
    // (exact BIGINT arithmetic, engine-neutral), 90/10 by hash bucket:
    // reproducible at any parallelism, no RNG state, and a narrow
    // codegen'd projection at 100 TB. The id is pre-reduced mod a prime
    // so the multiply can never overflow BIGINT — 64-bit production ids
    // would otherwise trip Spark's ANSI overflow check (and DuckDB's)
    // at id ≈ 3.5e9.
    "q47_hash_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split",
          when(pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(4294967296L)) % 100 < 90, "train")
            .otherwise("val"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))
    }),

    // Vocabulary building: corpus-wide token frequencies, top 50 — the
    // explode → count shape (map-side partial agg keeps the shuffle to
    // distinct tokens, then TakeOrderedAndProject for the top-k).
    "q48_vocab_topk" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(50)
    }),

    // Class-balanced downsample: 20 docs per language, chosen by the
    // same multiplicative id hash — deterministic stratified sampling
    // (per-group hash order ≈ uniform, reproducible across engines,
    // partitionings, and reruns — none of which holds for RNG sampling).
    "q49_balanced_sample" -> ((s, d) => {
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(4294967296L))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Weighted domain mixing: per-group Bernoulli keep rates from a
    // deterministic id hash — the "30% code, 60% web, 10% books"
    // sampling step of a training-data mix. Zero shuffle (narrow
    // filter), reproducible at any parallelism, and exact integer
    // arithmetic both engines — unlike rand()-based sampling, the kept
    // set is a pure function of (id, weights). Per-language rates here;
    // group weights otherwise unrepresentable in the fixture.
    "q72_weighted_mix" -> ((s, d) => {
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(4294967296L)) % 1000
      val rate = when(col("lang") === "en", 900)
        .when(col("lang") === "de", 500)
        .otherwise(100)
      Tables.documents(s, d)
        .filter(h < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))
    }),

    // TF-IDF scoring: tokens → per-doc term frequencies → document
    // frequencies → join back → tf·ln(N/df). Two shuffles (per-doc
    // tf, per-term df) + one broadcast-able join on the term — the
    // textbook shape. The checked output is the per-doc tfidf SUM (not
    // the argmax term): ranking by a libm-computed score could flip on
    // last-ulp ln() differences between engines, while a rounded sum
    // absorbs them.
    "q48b_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val docFreq = toks.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(docFreq), "token")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_terms"),
          round(sum(col("tf") * log(lit(n.toDouble) / col("df"))), 4).as("tfidf_sum"))
        .orderBy(col("doc_id"))
    }),

    "q44_doc_group_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 2).as("avg_chars"),
          sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"))
        .orderBy(col("lang"), col("source"))
    }),

    // Sequence packing: split each document into fixed-size token
    // windows (the LLM context-chunking step) — one output row per
    // chunk of 32 tokens, with the tail chunk short. Pure integer
    // arithmetic over the token count (explode of a sequence, narrow,
    // no shuffle), so it oracles exactly; empty docs still yield their
    // single (empty) chunk like the frame sampler does.
    "q71_token_chunks" -> ((s, d) => {
      val n = TextAnalysis.tokenCount(col("text"))
      Tables.documents(s, d)
        .withColumn("__n", n)
        .withColumn("chunk_idx",
          explode(sequence(lit(0), greatest(ceil(col("__n") / 32.0).cast("int"), lit(1)) - 1)))
        .select(
          col("doc_id"), col("chunk_idx"),
          least(lit(32), col("__n") - col("chunk_idx") * 32).as("chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // End-to-end curation pipeline — the composition a training-data
    // job actually runs, as ONE declarative plan: score quality →
    // filter → exact near-dup clusters → keep one representative per
    // cluster → deterministic hash split → per-split stats. Every
    // stage is the already-oracled operator (q42 quality, q38
    // components, q47 split), so the whole pipeline hash-checks.
    // Catalyst fuses the scoring+filter into the scan-side projection;
    // the only wide ops are the pair join and the final small agg.
    "q70_curation_pipeline" -> ((s, d) => {
      val scored = GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("__toks"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"))
        .select(col("doc_id"), col("text"),
          size(col("__toks")).as("n_tokens"),
          col("punct_ratio"),
          TextAnalysis.stopwordRatioT(col("__toks"), TextAnalysis.defaultStopwords)
            .as("stopword_ratio"),
          TextAnalysis.languageIdT(col("__toks")).as("lang_pred"))
        .select(col("doc_id"), col("text"), col("n_tokens"), col("lang_pred"),
          TextAnalysis.qualityFromMetrics(
            col("n_tokens"), col("stopword_ratio"), col("punct_ratio")).as("quality"))
      val good = scored.filter(col("quality") >= 0.7)
      val pairs = TextDedup.jaccardPairsExact(
        good.select(col("doc_id"), col("text")), "doc_id", "text", 3, 0.5)
      val comps = DedupClusters.components(pairs)
      val kept = good.join(comps, good("doc_id") === comps("node"), "left")
        .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      kept
        .withColumn("split",
          when(pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(4294967296L)) % 100 < 90, "train")
            .otherwise("val"))
        .groupBy(col("split"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("split"), col("lang_pred"))
    }),

    // ---- Streaming shapes (batch-equivalent plans; the same code runs
    //      under readStream — proven in EventStreamsSpec) ----

    "q50_events_hourly" -> ((s, d) => {
      EventStreams.hourlyStats(Tables.events(s, d))
        .orderBy(col("hour"), col("event_type"))
    }),

    "q51_sliding_windows" -> ((s, d) => {
      EventStreams.slidingRate(Tables.events(s, d))
        .orderBy(col("win_start"), col("event_type"))
    }),

    "q52_sessionize" -> ((s, d) => {
      import s.implicits._
      val ev = GraftSession.widen(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("value")))
        .as[EventStreams.SessionEvent]
      EventStreams.sessionize(ev, gapMinutes = 60).toDF()
        .select(
          col("user_id"), col("n_events"),
          round(col("total_value"), 2).as("total_value"),
          col("start_ts"), col("end_ts"))
        .orderBy(col("user_id"), col("start_ts"))
    }),

    // Interval (stream-stream-joinable) join: clicks ⋈ purchases of the
    // same user within the preceding hour. Same code runs watermarked
    // under readStream (EventStreamsSpec).
    // q112: cohort retention — users bucketed by first-seen week,
    // distinct activity weeks joined back. Two user-keyed aggs + one
    // (user)-keyed join; count is over already-distinct (user, week)
    // pairs so the final agg needs no count-distinct expansion.
    "q112_cohort_retention" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"), col("ts"))
      val first = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      e.select(col("user_id"), date_trunc("week", col("ts")).as("activity_week"))
        .distinct()
        .join(first, "user_id")
        .groupBy(col("cohort_week"), col("activity_week"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("activity_week"))
    }),

    // q114: hourly rate anomalies per event type — z-score of each
    // hour's count vs the type's mean/std, aggs + one broadcast-sized
    // join (per-type stats), no window anywhere.
    "q114_rate_anomaly" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy(col("event_type"))
        .agg(avg(col("n")).as("mean_n"), stddev_samp(col("n")).as("std_n"))
      hourly.join(broadcast(stats), "event_type")
        // threshold membership is decided on the ROUNDED z — the same
        // quantized value both engines output — so a z at the 2.0
        // boundary cannot be included by one float path and excluded
        // by the other (Spark's partial-agg avg/stddev and DuckDB's
        // can differ in the last ulps)
        .withColumn("z", round((col("n") - col("mean_n")) / col("std_n"), 4))
        .filter(col("z") >= 2.0)
        .select(col("event_type"), col("hour"), col("n"), col("z"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // q113: ordered funnel view -> click -> purchase — the N-stage
    // Funnel operator at 3 stages: each stage is "min event time
    // strictly after the previous stage's time", a user-keyed agg over
    // a semi-filtered scan — no window, no sequence materialization
    // (FunnelSpec pins 4-stage semantics; PlanSpec the window-free
    // shape).
    "q113_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      graft.operators.Funnel.funnel(ev, Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    }),

    "q53_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      EventStreams.clickPurchaseJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    // Map scalar + higher-order map functions (map_from_arrays /
    // create_map / map_keys / transform_values / map_filter), outputs
    // kept scalar so the driver can canonicalize. The oracle mirrors
    // the SEMANTICS (what each map op evaluates to), not the map type.
    "q43_map_fns" -> ((s, d) => {
      val m = map_from_arrays(
        array(lit("brand"), lit("type")),
        array(col("p_brand"), col("p_type")))
      Tables.part(s, d).select(
        col("p_partkey"),
        element_at(m, "brand").as("brand"),
        size(m).as("n_keys"),
        array_join(map_keys(m), ",").as("keys_csv"),
        element_at(transform_values(
          map(lit("t"), col("p_type")), (_, v) => upper(v)), "t").as("type_upper"),
        element_at(map_filter(
          map(lit("sz"), col("p_size")), (_, v) => v > 20), "sz").as("big_size"))
        .orderBy(col("p_partkey"))
    }),

    // Explicit GROUPING SETS + grouping() markers through the shared
    // SQL front end (ROLLUP/CUBE cover the derived lattices; this is
    // the general form with a hand-picked set list).
    "q45_grouping_sets" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(sharedSqlGroupingSets)
    }),

    // Correlated LATERAL subquery in FROM — per-order aggregate over
    // its lineitems, decorrelated by Catalyst into a join. The shared
    // text filters the no-lineitem orders explicitly because the
    // engines disagree on preserving them (Spark plans a left outer
    // and keeps NULL rows; DuckDB's decorrelation drops them).
    "q46_lateral_join" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sharedSqlLateral)
    }),

    // The custom whole-operator plan node (TopKPerKeyPlan → Strategy →
    // Exec, SURVEY §4.3(c)): heap-bounded per-key top-k, oracled
    // against the window formulation it replaces — same rows, O(n log k)
    // and only map_partitions·k rows per key shuffled instead of a full
    // per-partition sort of every candidate.
    "q57_topk_perkey" -> ((s, d) => {
      graft.plans.TopKPerKey.rankedTopK(
        Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
        "l_suppkey", Seq("l_shipdate", "l_orderkey", "l_linenumber"), k = 3)
        .select(col("l_suppkey"), col("rank"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_suppkey"), col("rank"))
    }),

    // Salted skew join: hot-key-proof equi-join (probe side salted,
    // build side replicated S ways) — result-identical to the plain
    // inner join, which is exactly what the oracle checks.
    "q58_salted_skew_join" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.operators.SkewJoin
        .saltedInnerJoin(Tables.lineitem(s, d), sup, "l_suppkey", saltBuckets = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("s_nationkey"))
    }),

    // Typed UDAF surface (Aggregator[IN,BUF,OUT] with map-side combine):
    // mean recall of dimension-truncated search (first 16 of 64 dims)
    // against the full-dimension exact top-5 — deterministic inputs, so
    // the whole pipeline including the custom aggregate oracles.
    "q59_recall_udaf" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
        .crossJoin(broadcast(q))
      def top5Ids(dist: org.apache.spark.sql.Column, out: String): DataFrame =
        cand.withColumn("dist", dist)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))))
          .filter(col("rank") <= 5)
          .groupBy(col("query_id"))
          .agg(sort_array(collect_list(col("neighbor_id"))).as(out))
      val retrieved = top5Ids(
        sqEucDist(slice(col("embedding"), 1, 16), slice(col("qvec"), 1, 16)), "retrieved")
      val truth = top5Ids(sqEucDist(col("embedding"), col("qvec")), "truth")
      val pairs = retrieved.join(truth, "query_id")
        .select(col("retrieved"), col("truth")).as[(Seq[Long], Seq[Long])]
      pairs.select(graft.functions.RecallAggregator.toColumn.name("mean_recall"))
        .select(round(col("mean_recall"), 4).as("mean_recall"))
    }),

    // SQL front end: the same SQL text runs through Spark's parser →
    // Catalyst and through DuckDB (TPC-H Q3 shape). Demonstrates the
    // engine's spark.sql surface over registered views.
    "q54_sql_frontend" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sharedSqlQ3)
    }),

    // Correlated scalar subquery (TPC-H Q17 shape) through the shared
    // SQL text: Catalyst decorrelates the per-part average into an
    // aggregate + join — an optimizer capability the DataFrame-built
    // queries don't reach. l_quantity is integral so the subquery avg
    // is order-independent (exact integer sum in f64) on both engines.
    "q56_correlated_subquery" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sharedSqlQ17)
    }),

    // SQL surface of the native codegen vector kernels: the same
    // sq_euc_dist / vec_dot / cosine_sim expressions every ANN path
    // re-ranks with, exercised through spark.sql and hash-checked
    // bit-exactly against DuckDB (both sides accumulate f32 inputs in
    // f64, left to right — verified identical to the last ulp).
    "q55_sql_vector_fns" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.embeddings(s, d).createOrReplaceTempView("embeddings")
      s.sql("""SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        sq_euc_dist(a.embedding, b.embedding) AS dist,
        vec_dot(a.embedding, b.embedding) AS dot_ab,
        cosine_sim(a.embedding, b.embedding) AS cos_ab
        FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id < 5
        ORDER BY query_id, neighbor_id""")
    }),

    // q162: the CURATION layer through the SQL frontend — the
    // round-7 gap: q54/q55 exposed the vector kernels to SQL, but a
    // SQL-only user couldn't reach normalization / quality / langid /
    // PII redaction. All four are registered the q55 way (the SAME
    // Column compositions the DataFrame API runs — one source of
    // semantics) and exercised verbatim through spark.sql under a full
    // DuckDB oracle assembled from the q144/q42/q153 mirror fragments.
    "q162_sql_curation" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.documents(s, d).createOrReplaceTempView("documents")
      s.sql("""SELECT doc_id,
        quality_score(text) AS quality,
        language_id(text) AS lang_pred,
        normalize_text(text) AS norm_text,
        redact_pii(text) AS redacted
        FROM documents ORDER BY doc_id""")
    }),

    // q163: DSIR-style importance resampling (Xie et al. 2023) — the
    // "make the crawl look like the exemplar" selector: raw docs
    // (lang ≠ es) scored by the log importance ratio of their
    // unigram+bigram counts under two add-1-smoothed bag-of-ngrams
    // models (target = the es exemplar slice), top-25 kept with an id
    // tiebreak. String-feature variant of the paper's hashed features,
    // which is what makes the whole path exactly SQL-mirrorable.
    "q163_dsir_select" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Dsir.selectTopK(
        docs.filter(col("lang") =!= "es"),
        docs.filter(col("lang") === "es"), k = 25)
    }),

    // q165: distinct-n diversity per source (Li et al. 2016's
    // distinct-1/2) — the templatedness report a pipeline reads before
    // admitting synthetic text into a mix. Two narrow explodes, two
    // partial-agg counts; ngram pairs shuffle, never documents.
    "q165_distinct_ngrams" -> ((s, d) => {
      TextAnalysis.distinctNgrams(
          GraftSession.widen(Tables.documents(s, d)), "source", "text")
        .orderBy(col("source"))
    }),

    // q166: Gopher's top-2-gram repetition rule — the phrase-level
    // repetition dupLineRatio can't see (q68's line dedup scores 0 on
    // a doc repeating one phrase inside long lines). Argmax as
    // max-of-struct per doc: partial-agg, deterministic ties, no
    // window.
    "q166_top_ngram" -> ((s, d) => {
      TextAnalysis.topNgramCharFraction(
          GraftSession.widen(Tables.documents(s, d)), "doc_id", "text", n = 2)
        .orderBy(col("doc_id"))
    }),

    // q167: the companion repetition rule — fraction of token chars
    // covered by repeated 2-gram occurrences (capped at 1; the
    // conservative overlap-free approximation, documented in the
    // operator). One explode, two partial aggs, one id-keyed join.
    "q167_dup_ngram" -> ((s, d) => {
      TextAnalysis.dupNgramCharFraction(
          GraftSession.widen(Tables.documents(s, d)), "doc_id", "text", n = 2)
        .orderBy(col("doc_id"))
    }),

    // q168: INVARIANT GATE for the rows-only families (the q83
    // pattern, extended beyond ANN): the no_oracle queries carry spec
    // coverage, but specs don't run in the driver's gate — this query
    // recomputes each family's defining invariant IN-ENGINE and emits
    // deterministic ok-bits hash-checked against a constant-truth
    // oracle. simhash: banded pair set ≡ brute-force Hamming pairs
    // (covers q31). bpe: decode∘encode reproduces the normalized text
    // on the in-alphabet slice (covers q117's serving contract). hll:
    // approx_count_distinct within 5% of exact on q20b's targets
    // (HLL++ is deterministic for given data — a constant bit).
    // deflate: doubling every doc lowers the mean ratio — the
    // redundancy ordering q118's quality proxy relies on. semdedup:
    // survivors/removed partition the corpus and every removed id has
    // a near-dup link (covers q74).
    "q168_invariant_gates" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).localCheckpoint()

      val fp = docs.select(col("doc_id").as("id"),
        TextDedup.simhash(col("text"), 2).as("fp")).localCheckpoint()
      // The brute (cartesian) oracle leg is BOUNDED to a deterministic
      // 500-id sample (smallest xxhash64(id) order — covers the whole
      // current fixture, so the gate's truth is unchanged today, and
      // the gate query's cost stays flat if the fixture ever grows;
      // the banded side stays full-corpus and is compared on the
      // sample's pair space). The gate bit: banded ≡ brute on S×S.
      val fpS = fp.orderBy(xxhash64(col("id")), col("id")).limit(500)
        .localCheckpoint()
      val sampleIds = fpS.select(col("id"))
      val banded = TextDedup.simhashPairsBandedFp(fp, maxHamming = 8)
        .select(col("id_a"), col("id_b"))
        .join(broadcast(sampleIds.select(col("id").as("id_a"))), Seq("id_a"), "left_semi")
        .join(broadcast(sampleIds.select(col("id").as("id_b"))), Seq("id_b"), "left_semi")
        .select(col("id_a"), col("id_b")) // joins key-reorder columns; exceptAll is positional
      val brute = fpS.as("x").join(fpS.as("y"), col("x.id") < col("y.id"))
        .filter(TextDedup.hamming(col("x.fp"), col("y.fp")) <= 8)
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      val simhashOk = banded.exceptAll(brute).isEmpty &&
        brute.exceptAll(banded).isEmpty

      val inAlpha = docs.filter(lower(col("text")).rlike("^[a-wy\\s]*$"))
      val decodeU = udf { ids: Seq[Long] =>
        graft.operators.Bpe.decodeIds(ids, BpeAssets.vocab) }
      val norm = concat_ws(" ",
        filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0))
      val bpeRows = inAlpha.select(
          (decodeU(graft.operators.Bpe.encodeIds(col("text"),
            BpeAssets.merges, BpeAssets.vocabMap)) === norm).as("ok"))
        .agg(count(lit(1)).as("n"), sum(when(col("ok"), 0).otherwise(1)).as("bad"))
        .head()
      val bpeOk = bpeRows.getLong(0) > 0 && bpeRows.getLong(1) == 0

      val li = Tables.lineitem(s, d)
      val h = li.agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        count_distinct(col("l_partkey")).as("ep"),
        approx_count_distinct(col("l_orderkey")).as("ao"),
        count_distinct(col("l_orderkey")).as("eo")).head()
      def close(a: Long, e: Long) = math.abs(a - e) <= 0.05 * e
      val hllOk = close(h.getLong(0), h.getLong(1)) &&
        close(h.getLong(2), h.getLong(3))

      val defl = docs.agg(
        avg(TextAnalysis.compressionRatio(col("text"))).as("r1"),
        avg(TextAnalysis.compressionRatio(
          concat(col("text"), lit(" "), col("text")))).as("r2")).head()
      val deflateOk = defl.getDouble(1) < defl.getDouble(0)

      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .localCheckpoint()
      // ONE cell-pair pass feeds both the survivor set and the link
      // check (survivors() would refit the IVF and recompute the pairs)
      val pairs = graft.operators.SemanticDedup.cellPairs(
        e, "vec_id", "embedding", threshold = 0.4, nlist = 16)
        .localCheckpoint()
      val surv = graft.operators.DedupClusters.survivors(
        e, "vec_id", graft.operators.DedupClusters.components(pairs))
        .select(col("vec_id")).localCheckpoint()
      val removed = e.select(col("vec_id")).join(surv, Seq("vec_id"), "left_anti")
      val linked = pairs.select(col("id_a").as("vec_id"))
        .unionByName(pairs.select(col("id_b").as("vec_id"))).distinct()
      val semOk = surv.join(e, Seq("vec_id"), "left_anti").isEmpty &&
        removed.join(linked, Seq("vec_id"), "left_anti").isEmpty &&
        surv.count() + removed.count() == e.count()

      // q41's remaining rows-only columns: the xxhash64 fingerprint
      // must be a function of the normalized token stream (equal
      // streams → equal fps) and collision-free on the fixture
      // (distinct fps == distinct streams — deterministic, so a
      // constant bit), and the subword splitter can only refine the
      // whitespace tokenization (subwords ≥ tokens on every doc)
      val fpr = docs.select(
        TextAnalysis.fingerprint(col("text")).as("fp"),
        concat_ws(" ", TextAnalysis.tokens(col("text"))).as("stream"),
        (TextAnalysis.subwordCount(col("text")) >=
          TextAnalysis.tokenCount(col("text"))).as("sw_ok"))
        .agg(count_distinct(col("fp")).as("nfp"),
          count_distinct(col("stream")).as("nst"),
          sum(when(col("sw_ok"), 0).otherwise(1)).as("sw_bad")).head()
      val fpOk = fpr.getLong(0) == fpr.getLong(1)
      val swOk = fpr.getLong(2) == 0

      Seq(
        ("bpe_roundtrip", if (bpeOk) 1 else 0),
        ("deflate_redundancy_orders", if (deflateOk) 1 else 0),
        ("fingerprint_stream_bijective", if (fpOk) 1 else 0),
        ("hll_within_5pct", if (hllOk) 1 else 0),
        ("semdedup_partition", if (semOk) 1 else 0),
        ("simhash_banded_eq_brute", if (simhashOk) 1 else 0),
        ("subwords_refine_tokens", if (swOk) 1 else 0))
        .toDF("component", "ok")
        .orderBy(col("component"))
    }),

    // q169: the DEDUP-GATED ingestion pipeline under the hash gate —
    // documents arrive in 3 id-ordered add waves through
    // `IndexMaintenance.applyGatedUpserts` (the maintainStreamDeduped
    // unit; the gated scenario spec covers edits/takedowns): each wave
    // is classified, near-dup-admitted against the standing signature
    // store, and the admitted docs append into the standing BM25
    // index. Admission is batching-independent (the q87 contract), so
    // the final index serves BM25 over exactly q87's admitted set —
    // the oracle composes q87's admitted CTE with the q146-style BM25
    // replay, proving admission and maintenance compose bit-exactly.
    "q169_gated_ingest" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      graft.streaming.IndexMaintenance.initStores(s, "graft_q169_idx")
      graft.streaming.IngestDedup.initStore(s, "graft_q169_sigs")
      graft.sources.Sinks.dropTable(s, "graft_q169_sigs_pending_rm")
      // TWO waves (bootstrap + append-into-existing): the admitted set
      // (hence the oracle) is wave-count-independent — admission is
      // order-independent — so the third wave bought no coverage, only
      // gate wall (the r10 verdict's wall-time item)
      val n = 2
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val step = (maxId + n) / n
      for (k <- 0 until n)
        graft.streaming.IndexMaintenance.applyGatedUpserts(
          s, "graft_q169_idx", "graft_q169_sigs",
          docs.filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step),
          ver = k + 1L, buckets = 8)
      val probeTerms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("t"))
        .distinct().collect().map(_.getString(0)).toSeq
      graft.operators.Bm25.scoreIndexed(s, "graft_q169_idx", probeTerms)
        .select(col("doc_id"), col("n_matched"), round(col("bm25"), 4).as("bm25"))
        .orderBy(col("doc_id"))
    }),

    // q171: the dedup-gated pipeline maintaining BOTH stores from ONE
    // admission decision (r8 verdict #1) — text index and ANN/vector
    // store fold from the same per-batch classification in
    // `applyGatedUpserts`: admitted adds append text AND vectors,
    // edits remove+reappend, takedowns remove from both. Three add
    // waves (q169's schedule, corpus = documents ⋈ embeddings), then
    // an edit+takedown wave over the live set. The oracle mirrors the
    // deterministic halves exactly (q87's admission CTE gives the
    // admitted set, so the edited/removed/final store sizes are plain
    // SQL counts); the seeded-geometry halves are in-engine
    // constant-truth bits (store ids ≡ live index ids, stored vectors
    // bit-equal to source embeddings, folded-model ANN recall vs exact
    // KNN over the live corpus ≥ floor — the q83/q168 gate pattern).
    "q171_gated_ann" -> ((s, d) => {
      import s.implicits._
      import graft.streaming.IndexMaintenance
      val idx = "graft_q171_idx"; val sig = "graft_q171_sigs"
      IndexMaintenance.initStores(s, idx)
      graft.streaming.IngestDedup.initStore(s, sig)
      graft.sources.Sinks.dropTable(s, sig + "_pending_rm")
      val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .join(Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
        .localCheckpoint()
      // TWO add waves + the edit/takedown wave: unlike q245/q208 this
      // schedule is NOT trimmable to one add wave — the forest model
      // is fitted on the wave-1 seed and then GROWN by the fold's
      // appends, and that seed-then-append shape is exactly what the
      // recall gate certifies (a fit over the full corpus packs the
      // fixed-depth leaves tighter and legitimately serves fewer
      // candidates; measured: the 0.70 floor fails). The admitted set
      // (hence the oracle counts) stays wave-count-independent.
      val n = 2
      val maxId = corpus.agg(max(col("doc_id"))).head().getLong(0)
      val step = (maxId + n) / n
      def wave(k: Int) = corpus
        .filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
      // wave 1 bootstraps the index; the ANN model is then fitted on
      // exactly the wave-1 ADMITTED vectors (maintainStream's
      // seed-batch-then-stream pattern)
      val d1 = IndexMaintenance.applyGatedUpserts(s, idx, sig, wave(0),
        ver = 1L, buckets = 8)
      val admitted1 = corpus.join(d1.filter(col("status") === "added")
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("embedding")).localCheckpoint()
      val ref = new java.util.concurrent.atomic.AtomicReference(
        graft.ann.DistributedAnnForest(numTrees = 4, maxLeafSize = 64, seed = 99L)
          .fit(admitted1, idCol = "doc_id"))
      // the SECOND store on the same admission decision: a standing IVF
      // store maintained backend-agnostically through the VecFold hook
      // (one gate, N stores — ivf_* components below prove the fold)
      val ivfStore = "graft_q171_ivf"
      for (t <- Seq(ivfStore, ivfStore + "_tombstones", ivfStore + "_rebuilt",
          ivfStore + "_rebuilt_tombstones"))
        graft.sources.Sinks.dropTable(s, t)
      val ivf = graft.ann.IvfIndex(nlist = 8, nprobe = 8, seed = 17L)
        .fit(admitted1)
      val fold = IndexMaintenance.ivfStoreFold(s, ivf, ivfStore, buckets = 8)
      fold(s.range(0).select(col("id").as("doc_id")), admitted1)
      for (k <- 1 until n)
        IndexMaintenance.applyGatedUpserts(s, idx, sig, wave(k),
          ver = k + 1L, buckets = 8, annRef = Some(ref), vecFold = Some(fold))
      // wave 4: edits (live ids ≡ 1 mod 10 — text v2, same embedding)
      // and takedowns (live ids ≡ 2 mod 10), over the LIVE set so the
      // oracle can name both slices from the admitted CTE
      val live3 = s.table(idx + "_doclens").select(col("doc_id")).localCheckpoint()
      val edits = corpus.join(live3, Seq("doc_id"), "left_semi")
        .filter(pmod(col("doc_id"), lit(10)) === 1)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          col("embedding"))
      val dels = live3.filter(pmod(col("doc_id"), lit(10)) === 2)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(null).cast("array<float>").as("embedding"))
      val d4 = IndexMaintenance.applyGatedUpserts(s, idx, sig,
        edits.unionByName(dels), ver = 4L, buckets = 8, annRef = Some(ref),
        vecFold = Some(fold))
        .localCheckpoint()
      val nEdited = d4.filter(col("status") === "changed").count()
      val nRemoved = d4.filter(col("status") === "removed").count()

      val model = ref.get
      val tomb =
        if (s.catalog.tableExists(idx + "_tombstones"))
          s.table(idx + "_tombstones").select(col("doc_id"))
        else s.range(0).select(col("id").as("doc_id"))
      val liveIds = s.table(idx + "_doclens").select(col("doc_id"))
        .join(tomb, Seq("doc_id"), "left_anti").localCheckpoint()
      val storeIds = model.corpusBuckets
        .select(col("neighbor_id").as("doc_id")).distinct().localCheckpoint()
      val idsOk = storeIds.exceptAll(liveIds)
        .unionAll(liveIds.exceptAll(storeIds)).isEmpty
      // euclidean model: __cvec is the raw vector — bit-exact against
      // the source embeddings for every stored id
      val vecsOk = model.corpusBuckets
        .select(col("neighbor_id").as("doc_id"), col("__cvec")).distinct()
        .join(corpus.select(col("doc_id"), col("embedding")), Seq("doc_id"))
        .filter(!(col("__cvec") === col("embedding"))).isEmpty
      val liveCorpus = corpus.join(liveIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("vec_id"), col("embedding")).localCheckpoint()
      val queries = liveCorpus.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val exact = KnnExact.knnBatch(liveCorpus, queries, 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      val hits = model.knnJoin(queries, topK = 5)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
      val total = exact.count()
      val recallOk = total > 0 && hits.toDouble / total >= 0.70
      // the IVF leg's proof: store ids ≡ live index ids, and the
      // maintained table is TABLE-equal (cells included) to a fresh
      // saveStore of the live vectors under the same frozen quantizer
      val ivfIds = s.table(ivfStore)
        .select(col("neighbor_id").as("doc_id")).distinct().localCheckpoint()
      val ivfIdsOk = ivfIds.exceptAll(liveIds)
        .unionAll(liveIds.exceptAll(ivfIds)).isEmpty
      ivf.saveStore(corpus.join(liveIds, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("embedding")),
        ivfStore + "_rebuilt", buckets = 8,
        corpusId = "doc_id", corpusVec = "embedding")
      val ivfA = s.table(ivfStore); val ivfB = s.table(ivfStore + "_rebuilt")
      val ivfEq = ivfA.exceptAll(ivfB).unionAll(ivfB.exceptAll(ivfA)).isEmpty
      Seq(
        ("ann_recall_ok", if (recallOk) 1L else 0L),
        ("ivf_ids_eq_index", if (ivfIdsOk) 1L else 0L),
        ("ivf_store_eq_rebuilt", if (ivfEq) 1L else 0L),
        ("n_edited", nEdited),
        ("n_removed", nRemoved),
        ("n_store", storeIds.count()),
        ("store_ids_eq_index", if (idsOk) 1L else 0L),
        ("store_vecs_bit_exact", if (vecsOk) 1L else 0L))
        .toDF("component", "val")
        .orderBy(col("component"))
    }),

    // ---- Multimodal plumbing (stub codec; rows-only check) ----

    // Output kept scalar-only: the driver canonicalizes results with a
    // pandas sort over every column, which cannot order an ARRAY column
    // — so the 8-dim feature vector is summarized (dim + L1 mass + first
    // component), not emitted raw. The full vector stays available via
    // Multimodal.decodeFeatures. The stub's lane sums are exact integer
    // arithmetic with one f32 rounding per lane, so the whole decode is
    // DuckDB-reproducible (hex(payload) → byte list → lane sums).
    "q60_media_decode" -> ((s, d) => {
      val media = Multimodal.asMediaTable(
        Tables.documents(s, d), "doc_id", "text", "source")
      Multimodal.decodeFeatures(media)
        .select(
          col("media_id"), col("width"), col("height"),
          size(col("features")).as("n_features"),
          round(aggregate(col("features"), lit(0.0d), (acc, x) => acc + x), 4).as("feat_l1"),
          round(element_at(col("features"), 1).cast("double"), 4).as("feat_0"))
        .orderBy(col("media_id"))
    }),

    "q61_media_frames" -> ((s, d) => {
      val media = Multimodal.asMediaTable(
        Tables.documents(s, d), "doc_id", "text", "source")
      Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
        .select(col("media_id"), col("frame_idx"), length(col("frame")).as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Resize stub: keep every 3rd payload byte — deterministic byte
    // arithmetic, so the metadata (n_bytes) is fully oracle-checkable.
    "q62_media_resize" -> ((s, d) => {
      val media = Multimodal.asMediaTable(
        Tables.documents(s, d), "doc_id", "text", "source")
      Multimodal.resize(media, factor = 3)
        .select(col("media_id"), col("meta.n_bytes").as("resized_bytes"))
        .orderBy(col("media_id"))
    }),

    // ---- Curation additions (round 5): LM scoring, span-dup metrics,
    //      dimensionality reduction, semantic dedup ----

    // Unigram-LM quality score (CCNet-style perplexity proxy): corpus
    // token counts → per-doc mean ln p(token). One vocab agg (partial
    // combine), one token join, one per-doc agg.
    "q73_unigram_logprob" -> ((s, d) => {
      graft.operators.UnigramLm.score(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // Per-doc duplicated-span ratio (exact substring-dup metric, Lee
    // et al. 2022): fraction of each doc's distinct 3-gram spans that
    // occur in ≥1 other document.
    "q76_dup_spans" -> ((s, d) => {
      TextDedup.dupShingleStats(Tables.documents(s, d), "doc_id", "text", ngram = 3)
        .orderBy(col("doc_id"))
    }),

    // Sparse random projection (Achlioptas / Johnson–Lindenstrauss):
    // 64 → 8 dims through a deterministic integer-arithmetic ±1 matrix.
    // The kernel is a narrow codegen'd map (no shuffle); the oracle
    // regenerates the same matrix from the same LCG in SQL. Output
    // exploded to scalar (vec_id, k, y) rows for the driver's compare.
    "q75_random_projection" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(graft.functions.RandomProjection.project(col("embedding"), 64, 8))
            .as(Seq("k", "y")))
        .select(col("vec_id"), col("k").cast("int").as("k"),
          round(col("y"), 4).as("y"))
        .orderBy(col("vec_id"), col("k"))
    }),

    // Per-dimension corpus statistics — the calibration pass scalar
    // quantization (q65) and whitening need: one narrow posexplode +
    // one 64-group aggregation with map-side combine.
    "q77_dim_stats" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("x")), 4).as("mean"),
          round(stddev_samp(col("x")), 4).as("std"),
          min(col("x")).cast("double").as("mn"),
          max(col("x")).cast("double").as("mx"))
        .orderBy(col("dim"))
    }),

    // SemDeDup: IVF-cell-blocked cosine components, one representative
    // per cluster (seeded quantizer ⇒ deterministic, but kmeans is not
    // SQL-expressible → rows-only driver check; semantics pinned in
    // SemanticDedupSpec).
    "q74_semantic_dedup" -> ((s, d) => {
      // τ = 0.4 matches q33's near-dup threshold on this fixture
      // (synthetic embeddings — real corpora use ~0.95+)
      graft.operators.SemanticDedup.survivors(
        Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.4, nlist = 16)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // BM25 keyword relevance (the lexical leg of hybrid search): query
    // = first 5 tokens of doc 0, scored over the whole corpus.
    "q78_bm25" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val terms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
      graft.operators.Bm25.score(docs, terms)
        .select(col("doc_id"), col("n_matched"), round(col("bm25"), 4).as("bm25"))
        .orderBy(col("doc_id"))
    }),

    // Hybrid search: BM25 rank ⊕ cosine rank fused by reciprocal-rank
    // fusion (rrf = Σ 1/(60+rank)) — the standard lexical+vector serving
    // query. Ranks are per-query global windows (a multi-query batch
    // partitions the window by query id); rrf is exact rational
    // arithmetic over integer ranks, so the fused ordering hashes
    // identically across engines.
    // Near-dup gate (the q83 pattern for the two by-design-no_oracle
    // near-dup operators): deterministic property bits hash-checked
    // against constant truth. simhash_recall: the Hamming≤8 pair set
    // recovers ≥90% of the exact-Jaccard≥0.5 pairs (measured 24/25 at
    // sf0.01, tools/ProbeCuration). semdedup_no_dup_survivors: no
    // same-cell pair with cos ≥ τ has BOTH endpoints surviving — the
    // defining invariant of SemDeDup's one-representative-per-component
    // contract, checked against the pair set itself.
    "q85_neardup_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val exact = TextDedup.jaccardPairsExact(docs, "doc_id", "text",
          ngram = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val fp = GraftSession.widen(docs)
        .select(col("doc_id"), TextDedup.simhash(col("text"), 2).as("fp"))
      val fa = fp.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
      val fb = fp.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
      val sim = fa.crossJoin(fb).filter(col("id_a") < col("id_b"))
        .withColumn("ham", TextDedup.hamming(col("fp_a"), col("fp_b")))
        .filter(col("ham") <= 8)
        .select(col("id_a"), col("id_b"))
      val simRecall = sim.join(exact, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("__hits"))
        .crossJoin(exact.agg(count(lit(1)).as("__n")))
        .select(lit("simhash_recall").as("component"),
          (col("__hits") / col("__n") >= lit(0.9)).cast("int").as("ok"))
      val e = Tables.embeddings(s, d)
      val pairs = graft.operators.SemanticDedup.cellPairs(
        e, "vec_id", "embedding", threshold = 0.4, nlist = 16)
      val surv = graft.operators.SemanticDedup.survivors(
          e, "vec_id", "embedding", threshold = 0.4, nlist = 16)
        .select(col("vec_id"))
      val noDupSurvivors = pairs
        .join(surv.withColumnRenamed("vec_id", "id_a"), Seq("id_a"), "left_semi")
        .join(surv.withColumnRenamed("vec_id", "id_b"), Seq("id_b"), "left_semi")
        .agg((count(lit(1)) === 0).cast("int").as("ok"))
        .select(lit("semdedup_no_dup_survivors").as("component"), col("ok"))
      simRecall.unionByName(noDupSurvivors).orderBy(col("component"))
    }),

    // Standing inverted-index serving under the driver gate: build the
    // bucket-pruned index, tombstone 10% of the docs (doc_id % 10 = 1),
    // serve from the index. The oracle computes BM25 over the SURVIVING
    // documents directly, so the hash match proves the delete-adjusted
    // statistics (per-term df, N, avgdl) are exact — not merely that
    // tombstoned postings were filtered out.
    "q84_bm25_indexed_delete" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      graft.operators.Bm25.removeDocs(s, idx,
        docs.filter(pmod(col("doc_id"), lit(10)) === 1).select("doc_id"))
      val qTerms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
        .collect().map(_.getString(0)).toSeq
      graft.operators.Bm25.scoreIndexed(s, idx, qTerms)
        .select(col("doc_id"), col("n_matched"), round(col("bm25"), 4).as("bm25"))
        .orderBy(col("doc_id"))
    }),

    // Hybrid serving over the STANDING index: identical fusion to q79,
    // but the BM25 leg reads the bucket-pruned inverted index instead
    // of scanning the corpus — scoreIndexed == score bit-for-bit
    // (shared weight formula, specced), so q79's oracle applies
    // unchanged and the hash match proves the standing index slots
    // into the hybrid path without moving a single score.
    "q95_hybrid_indexed" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      val terms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
        .collect().map(_.getString(0)).toSeq
      val bm = graft.operators.Bm25.scoreIndexed(s, idx, terms)
      val sBm = docs.select(col("doc_id"))
        .join(bm.select(col("doc_id"), col("bm25")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("bm25"), lit(0.0)).as("s"))
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("__qvec"))
      val sCos = e.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          cosine(col("embedding"), col("__qvec")).as("cos"))
      // fused ranks without a corpus-wide window (see q79)
      graft.operators.RankFusion.rrfTopK(
        sBm, "s", "rank_bm25", sCos, "cos", "rank_cos",
        idCol = "doc_id", k = 20, kRrf = 60, cand = 200)
    }),

    // q96: late-interaction (MaxSim / ColBERT) multi-vector retrieval.
    // Doc groups of 5 token vectors each; query = group 0. The SERVING
    // path runs (per-token candidate heap → exact refine) and the
    // oracle is the full exact MaxSim — candidate width recovers the
    // exact top-10, the q63/q64 shortlist pattern.
    "q96_maxsim" -> ((s, d) => {
      val mv = Tables.embeddings(s, d)
        .select(floor(col("vec_id") / 5).cast("long").as("gid"),
          col("vec_id").as("qt"), col("embedding").as("vec"))
      val corpus = mv.select(col("gid"), col("vec"))
      val queries = mv.filter(col("gid") === 0)
        .select(lit(0L).as("qid"), col("qt"), col("vec").as("qvec"))
      graft.operators.MaxSim.topKRefined(corpus, queries, k = 10, candPerTok = 64)
        .select(col("gid"), col("rank"), col("maxsim"))
        .orderBy(col("rank"))
    }),

    // q100: batch MaxSim — three query bags in ONE plan sharing the
    // corpus pass (the q80 batch-serving pattern): the cosine stage
    // fans out per query from the same corpus scan, aggregations key
    // by (qid, ...). Exact path ⇒ full oracle.
    "q100_maxsim_batch" -> ((s, d) => {
      val mv = Tables.embeddings(s, d)
        .select(floor(col("vec_id") / 5).cast("long").as("gid"),
          col("vec_id").as("qt"), col("embedding").as("vec"))
      val corpus = mv.select(col("gid"), col("vec"))
      val queries = mv.filter(col("gid") < 3)
        .select(col("gid").as("qid"), col("qt"), col("vec").as("qvec"))
      graft.operators.MaxSim.topK(corpus, queries, k = 5)
        .orderBy(col("qid"), col("rank"))
    }),

    // q101: length-weighted document sample per language WITHOUT
    // replacement (Efraimidis-Spirakis priorities over the portable
    // integer hash) — heap-served, no global sort. Complements q49's
    // UNIFORM per-key sample.
    "q101_weighted_sample" -> ((s, d) =>
      graft.operators.WeightedSample.perKey(
          Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          keyCol = "lang", idCol = "doc_id", weightCol = "n_chars", k = 5)
        .select(col("lang"), col("doc_id"), col("rank"))
        .orderBy(col("lang"), col("rank"))),

    // q104: MaxSim served with an ANN stage 1 — candidate doc groups
    // come from the seeded forest over the TOKEN store (the standing-
    // index serving shape: stage-1 cost follows probes, stage-2 cost
    // follows candidates; nothing scans the corpus per query). ANN
    // candidates are probabilistic, so like q83 the driver-gated
    // output is a constant-truth recall bit vs the exact MaxSim top-10
    // (floor 0.9; MaxSimSpec pins the full top-10 SET equality at
    // sf0.001 — the forest recalls token neighbors at 0.96+, and
    // MaxSim only needs SOME high-cos token of each true top group to
    // surface).
    "q104_maxsim_indexed" -> ((s, d) => {
      val mv = Tables.embeddings(s, d)
        .select(floor(col("vec_id") / 5).cast("long").as("gid"),
          col("vec_id").as("qt"), col("embedding").as("vec"))
      val corpus = mv.select(col("gid"), col("vec"))
      val queries = mv.filter(col("gid") === 0)
        .select(lit(0L).as("qid"), col("qt"), col("vec").as("qvec"))
      val tokens = mv.select(col("qt").as("vec_id"), col("vec").as("embedding"))
      val forest = AnnForest(numTrees = 50, maxLeafSize = 5, seed = 42L)
        .fit(tokens, "vec_id", "embedding")
      val annCands = forest.knnJoinBucketed(tokens,
          queries.select(col("qt").as("query_id"), col("qvec")), topK = 64)
        .select(col("query_id").as("qt"), col("neighbor_id"))
      val cands = annCands
        .join(mv.select(col("qt").as("neighbor_id"), col("gid")), Seq("neighbor_id"))
        .join(queries.select(col("qid"), col("qt")), Seq("qt"))
        .select(col("qid"), col("gid")).distinct()
      val got = graft.operators.MaxSim.topKOnCandidates(corpus, queries, 10, cands)
      val exact = graft.operators.MaxSim.topK(corpus, queries, 10)
      got.select(col("qid"), col("gid"))
        .join(exact.select(col("qid"), col("gid")), Seq("qid", "gid"))
        .agg(count(lit(1)).as("__hits"))
        .crossJoin(exact.agg(count(lit(1)).as("__total")))
        .select(lit("maxsim_indexed").as("component"),
          (col("__hits") / col("__total") >= lit(0.9)).cast("int").as("ok"))
    }),

    // q105: standing-index introspection — the numbers a compaction
    // policy reads (tombstone ratio, postings/vocabulary size), every
    // one mirrored exactly from the corpus + delete schedule in SQL.
    "q105_index_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      graft.operators.Bm25.removeDocs(s, idx,
        docs.filter(col("doc_id") % 10 === 1).select(col("doc_id")))
      graft.operators.Bm25.describeIndex(s, idx)
        .orderBy(col("metric"))
    }),

    // q121: forest-store compaction ACTUATOR — consumes the occupancy
    // stats q105-style introspection reports and acts: purges
    // tombstoned rows physically and merges under-occupied sibling
    // buckets (plane deletion ⇒ routing stops at the merged node, so
    // storage and routing cannot disagree), under Bm25's torn-rewrite
    // marker discipline. Forest structure is seeded-random (not
    // SQL-expressible), so the gate pins INVARIANTS as (component, ok)
    // rows, q104-style: fewer buckets, identical vector set, no
    // tombstone survives, and the before-results are a subset of the
    // after-results (a merged bucket is a candidate superset).
    "q121_forest_compaction" -> ((s, d) => {
      import graft.ann.{DistributedAnnForest, DistributedAnnModel}
      val e = Tables.embeddings(s, d)
      val dir = s.conf.get("spark.sql.warehouse.dir") + "/graft_q121_store"
      DistributedAnnForest(numTrees = 8, maxLeafSize = 5, maxDepth = 10, seed = 7L)
        .fit(e).save(dir)
      val removed = e.filter(col("vec_id") % 10 === 1).select(col("vec_id"))
      val queries = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      // every before-store read settles BEFORE the in-place rewrite
      val before = DistributedAnnModel.load(dir, s).remove(removed)
      val bucketsBefore = before.corpusBuckets
        .select(col("tree_id"), col("leaf_id")).distinct().count()
      val vecsBefore = before.corpusBuckets
        .select(col("neighbor_id")).distinct().count()
      val resBefore = before.radiusJoin(queries, maxDist = 1.2535)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      DistributedAnnModel.compactStore(s, dir, minBucketRows = 8,
        tombstones = Some(removed))
      val after = DistributedAnnModel.load(dir, s)
      val bucketsAfter = after.corpusBuckets
        .select(col("tree_id"), col("leaf_id")).distinct().count()
      val vecsAfter = after.corpusBuckets
        .select(col("neighbor_id")).distinct().count()
      val tombLeft = after.corpusBuckets
        .join(removed.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_semi").count()
      val resAfter = after.radiusJoin(queries, maxDist = 1.2535)
        .select(col("query_id"), col("neighbor_id"))
      val lost = resBefore.join(resAfter,
        Seq("query_id", "neighbor_id"), "left_anti").count()
      import s.implicits._
      Seq(
        ("buckets_reduced", if (bucketsAfter < bucketsBefore) 1 else 0),
        ("radius_nonempty", if (resBefore.count() > 0) 1 else 0),
        ("results_preserved", if (lost == 0) 1 else 0),
        ("tombstones_purged", if (tombLeft == 0) 1 else 0),
        ("vectors_preserved", if (vecsAfter == vecsBefore) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q172: IVF / IVF-PQ standing-store LIFECYCLE (q121's pattern for
    // the cell stores — r8 verdict #4): fit both quantizers on the
    // INITIAL corpus slice only, save the cell-assigned store, ingest
    // a delta with NO retrain (frozen centroids/codebooks — one
    // broadcast assignment pass + bucketed append), tombstone-delete,
    // serve with tombstones pending, compact physically, and compare
    // against a from-scratch rebuild of the live corpus under the SAME
    // quantizers. Frozen quantizers make maintained ≡ rebuilt an EXACT
    // bit (same home cells → same candidates → same distances), not
    // just a recall statement; recall floors vs exact KNN follow the
    // q83 gate policy. Seeded geometry → constant-truth (component,
    // ok) rows, q121-style.
    "q172_ivf_lifecycle" -> ((s, d) => {
      import s.implicits._
      import graft.ann.{IvfIndex, PqIndex}
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .localCheckpoint()
      val initial = e.filter(col("vec_id") < 300)
      val delta = e.filter(col("vec_id") >= 300)
      val removedIds = e.filter(pmod(col("vec_id"), lit(10)) === 3)
        .select(col("vec_id")).localCheckpoint()
      val liveCorpus = e.filter(pmod(col("vec_id"), lit(10)) =!= 3)
        .localCheckpoint()
      val queries = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        .localCheckpoint()
      val exact = KnnExact.knnBatch(liveCorpus, queries, 10)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      def ids(df: DataFrame) = df.select(col("query_id"), col("neighbor_id"))
        .localCheckpoint()
      def eq(a: DataFrame, b: DataFrame) =
        a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      def recallOk(got: DataFrame, floor: Double) = {
        val hits = got.join(exact, Seq("query_id", "neighbor_id")).count()
        hits.toDouble / exact.count() >= floor
      }

      val ivf = IvfIndex(nlist = 16, nprobe = 6, seed = 42L).fit(initial)
      val t = "graft_q172_ivf"
      ivf.saveStore(initial, t, buckets = 8)
      ivf.appendStore(delta, t, buckets = 8)
      ivf.removeStore(s, t, removedIds)
      val servedTomb = ids(ivf.knnJoinStore(s, t, queries, 10))
      ivf.compactStore(s, t, buckets = 8)
      val servedCompacted = ids(ivf.knnJoinStore(s, t, queries, 10))
      ivf.saveStore(liveCorpus, t + "_rb", buckets = 8)
      val servedRebuilt = ids(ivf.knnJoinStore(s, t + "_rb", queries, 10))
      val ivfPurged = !s.catalog.tableExists(t + "_tombstones") &&
        s.table(t).join(removedIds.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_semi").isEmpty
      val ivfIdsLive = eq(s.table(t).select(col("neighbor_id")),
        liveCorpus.select(col("vec_id").as("neighbor_id")))

      val pq = PqIndex(m = 16, seed = 42L).fit(initial)
      val pt = "graft_q172_pq"
      pq.saveCorpusIvf(ivf, initial, pt, buckets = 8)
      pq.appendCorpusIvf(ivf, delta, pt, buckets = 8)
      pq.removeCorpusIvf(s, pt, removedIds)
      val pqTomb = ids(pq.knnJoinIvfIndexed(s, ivf, pt, queries, 10))
      pq.compactCorpusIvf(s, pt, buckets = 8)
      val pqCompacted = ids(pq.knnJoinIvfIndexed(s, ivf, pt, queries, 10))
      pq.saveCorpusIvf(ivf, liveCorpus, pt + "_rb", buckets = 8)
      val pqRebuilt = ids(pq.knnJoinIvfIndexed(s, ivf, pt + "_rb", queries, 10))

      Seq(
        ("ivf_maintained_eq_rebuilt", if (eq(servedCompacted, servedRebuilt)) 1 else 0),
        ("ivf_recall_ok", if (recallOk(servedCompacted, 0.60)) 1 else 0),
        ("ivf_serve_eq_compacted", if (eq(servedTomb, servedCompacted)) 1 else 0),
        ("ivf_store_ids_live", if (ivfIdsLive) 1 else 0),
        ("ivf_tombstones_purged", if (ivfPurged) 1 else 0),
        ("pq_maintained_eq_rebuilt", if (eq(pqCompacted, pqRebuilt)) 1 else 0),
        ("pq_recall_ok", if (recallOk(pqCompacted, 0.45)) 1 else 0),
        ("pq_serve_eq_compacted", if (eq(pqTomb, pqCompacted)) 1 else 0))
        .toDF("component", "ok")
        .orderBy(col("component"))
    }),

    // q173: the engine's CORE query through the SQL frontend (the one
    // §4.3 "revisit" left open after q162 covered the curation layer):
    // `knn(qvec, k)` as a table-function-style entry — LATERAL VIEW
    // posexplode over the registered model's ARRAY<STRUCT> result.
    // The exact-backend face is hash-gated against DuckDB's brute KNN
    // (same top-10/"vec_id < 50" frame as q64's oracle); the ANN face
    // is the same registration and stays recall-gated (q83 policy;
    // ApiSpec pins SQL ≡ DataFrame for both faces).
    "q173_sql_knn" -> ((s, d) => {
      val model = forest50(s, d)
      model.registerSql(s, "graft_knn", "graft_knn_exact")
      Tables.embeddings(s, d).createOrReplaceTempView("embeddings")
      s.sql("""SELECT q.query_id, t.pos + 1 AS rank, t.h.neighbor_id
        FROM (SELECT vec_id AS query_id, embedding AS qvec
              FROM embeddings WHERE vec_id < 50) q
        LATERAL VIEW posexplode(graft_knn_exact(qvec, 10)) t AS pos, h
        ORDER BY query_id, rank""")
    }),

    // q174: exact-phrase BM25 — the positional layer of the standing
    // lexical index. Three forms under one oracle: the ad-hoc 2-gram
    // over the live corpus, the SAME phrase served from the standing
    // positional table with tombstones pending (indexed ≡ ad-hoc-over-
    // live bit-for-bit — the phrase is a single virtual term, so no
    // float-sum reordering; PhraseSearchSpec pins it), and a 3-gram
    // ad-hoc leg for multi-offset intersection. Plan shape: one
    // posexplode pre-filtered to phrase terms by a broadcast join
    // (ad-hoc) / a bucket-pruned positions scan (indexed), then a
    // (doc, start) aggregation counting witnessed offsets — overlaps
    // count, repeated-term phrases witness each offset once.
    "q174_phrase_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      graft.operators.Bm25.removeDocs(s, idx,
        docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"))
      val toks = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 3)).as("t"))
        .collect().map(_.getString(0)).toSeq
      val live = docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
      def shaped(df: org.apache.spark.sql.DataFrame, form: String) =
        df.select(lit(form).as("form"), col("doc_id"), col("phrase_tf"),
          round(col("bm25"), 4).as("bm25"))
      shaped(graft.operators.Bm25.phraseScore(live, toks.take(2)), "adhoc2")
        .unionByName(shaped(
          graft.operators.Bm25.phraseIndexed(s, idx, toks.take(2)), "indexed2"))
        .unionByName(shaped(
          graft.operators.Bm25.phraseScore(live, toks), "adhoc3"))
        .orderBy(col("form"), col("doc_id"))
    }),

    // q175: impact-tiered TOP-K serving — champion lists over the
    // standing index (per-term top-32 postings by BM25 weight on the
    // 4dp grid — cross-engine-stable membership at the cutoff —
    // heap-pruned through TopKPerKeyExec at build) vs the full
    // aggregation, both ranked on the 4dp grid with id tiebreak. The
    // tiered leg reads c·|terms| champion rows (bucket-pruned) and
    // rescores ONLY those docs exactly through the adjusted index, so
    // its scores are scoreIndexed's to the bit while the per-doc
    // aggregation shuffles candidate-bounded rows — the serving shape
    // that survives a hot term with df in the billions. Both legs are
    // fully deterministic and fully mirrored in SQL (champion
    // selection included), so the oracle checks the heuristic itself,
    // not just an overlap summary.
    "q175_bm25_champions" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      val qTerms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
        .collect().map(_.getString(0)).toSeq
      val tiered = graft.operators.Bm25.scoreIndexedTopK(s, idx, qTerms, 10)
        .select(lit("tiered").as("form"), col("rank"), col("doc_id"),
          col("n_matched"), round(col("bm25"), 4).as("bm25"))
      val full = graft.operators.Bm25.rankTopK(
          graft.operators.Bm25.scoreIndexed(s, idx, qTerms), 10)
        .select(lit("full").as("form"), col("rank"), col("doc_id"),
          col("n_matched"), round(col("bm25"), 4).as("bm25"))
      full.unionByName(tiered).orderBy(col("form"), col("rank"))
    }),

    // q178: the standing lexical index through the SQL frontend — the
    // q162/q173 story for the third surface: the index tables are
    // ordinary catalog tables, so a SQL-only user serves BM25 with
    // plain SQL over `<idx>_postings/_terms/_stats` (term-IN predicate
    // bucket-prunes exactly like the DataFrame path; D-suffixed
    // literals keep every constant a double, mirroring the Column
    // weight formula operation for operation). Hash-gated against the
    // same DuckDB oracle as the ad-hoc and DataFrame-indexed paths —
    // three engines, one score.
    "q178_sql_bm25" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      val qTerms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
        .collect().map(_.getString(0)).distinct.toSeq
      // Spark SQL string literals process backslash escapes (unlike
      // DuckDB's) — escape them BEFORE quoting or a token containing a
      // backslash would splice into a different (or unparseable) literal
      val inList = qTerms.map(t =>
        "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'").mkString(", ")
      s.sql(s"""
        WITH t AS (
          SELECT term, df FROM ${idx}_terms WHERE term IN ($inList)),
        st AS (
          SELECT n_docs, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl
          FROM ${idx}_stats)
        SELECT p.doc_id, count(*) AS n_matched,
          round(sum(ln(1.0D + (n_docs - df + 0.5D) / (df + 0.5D))
            * (tf * (1.2D + 1.0D))
            / (tf + 1.2D * (1.0D - 0.75D + 0.75D * dl / avgdl))), 4) AS bm25
        FROM ${idx}_postings p JOIN t USING (term), st
        WHERE p.term IN ($inList)
        GROUP BY p.doc_id ORDER BY doc_id""")
    }),

    // q179: WordPiece-style greedy longest-match (MaxMatch, Devlin et
    // al. 2019) token ids under the COMMITTED unigram piece asset
    // (PieceAssets — fixed-point integer costs, lexicographic ids) —
    // the third tokenizer family next to BPE (q119) and the Viterbi
    // unigram it shares its vocabulary with (q180). MaxMatch is
    // single-successor, so the DuckDB oracle replays it EXACTLY as a
    // linear recursive CTE generated from the same constants (one
    // equality join per piece length replaces the argmax — see
    // PieceAssets.maxMatchOracleSql). Narrow UDF encode, posexploded
    // to scalar (doc_id, pos, token_id) rows, hash-gated.
    "q179_maxmatch_ids" -> ((s, d) => {
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(graft.operators.UnigramTokenizer.maxMatchIds(
            col("text"), PieceAssets.costs, PieceAssets.ids,
            PieceAssets.MaxPieceLen)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // q180: unigram-LM (Kudo 2018) token ids — Viterbi segmentation
    // under the same committed piece costs q179 serves greedily. The
    // lattice DP has exponentially many paths, so no linear recursive
    // CTE can replay it (rows-only here); its defining invariants are
    // hash-gated in-engine by q181 instead (optimality vs the two
    // oracled/trivial segmentations, lossless roundtrip, EM
    // monotonicity), and the DP itself is specced on hand-checked
    // lattices. Integer-cost ties prefer fewer pieces then the
    // longest final piece — fully deterministic rows.
    "q180_unigram_ids" -> ((s, d) => {
      GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(graft.operators.UnigramTokenizer.viterbiIds(
            col("text"), PieceAssets.costs, PieceAssets.ids,
            PieceAssets.MaxPieceLen)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // q181: INVARIANT GATE for the unigram tokenizer family (the q168
    // pattern): q180's rows-only Viterbi face is pinned by in-engine
    // constant-truth ok-bits. viterbi_le_maxmatch / viterbi_le_chars:
    // the DP optimum never costs more than the greedy (q179-oracled)
    // or the all-single-characters segmentation — both live in
    // Viterbi's search space, so optimality is a constant TRUE a
    // broken DP breaks. viterbi_roundtrip: pieces concatenate back to
    // the normalized text on the in-alphabet slice. em_monotone /
    // probs_normalized: retraining on the fixture (same params as the
    // committed asset) must show non-decreasing within-round corpus
    // likelihood — the defining EM guarantee — and a normalized final
    // distribution. All deterministic: same fixture → same bits.
    "q181_tokenizer_gates" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val r = GraftSession.widen(docs).select(
          graft.operators.UnigramTokenizer.gateMetrics(col("text"),
            PieceAssets.costs, PieceAssets.MaxPieceLen).as("g"),
          lower(col("text")).rlike("^[a-wy\\s]*$").as("in_alpha"))
        .agg(
          sum(when(col("g._1") <= col("g._2"), 0).otherwise(1)).as("bad_mm"),
          sum(when(col("g._1") <= col("g._3"), 0).otherwise(1)).as("bad_ch"),
          sum(when(!col("in_alpha") || col("g._4"), 0).otherwise(1)).as("bad_rt"),
          sum(when(col("in_alpha"), 1).otherwise(0)).as("n_alpha"))
        .head()
      val fit = graft.operators.UnigramTokenizer.fit(docs, "text",
        vocabSize = 80, seedSize = 400, emIters = 2, maxPieceLen = 6)
      val emOk = fit.likelihoodTrajectories.forall(t =>
        t.lazyZip(t.tail).forall((a, b) => b >= a - 1e-9 * math.abs(a)))
      val probsOk = math.abs(fit.pieces.iterator.map(_._2).sum - 1.0) < 1e-6
      Seq(
        ("em_monotone_likelihood", if (emOk) 1 else 0),
        ("probs_normalized", if (probsOk) 1 else 0),
        ("viterbi_le_chars", if (r.getLong(1) == 0) 1 else 0),
        ("viterbi_le_maxmatch", if (r.getLong(0) == 0) 1 else 0),
        ("viterbi_roundtrip",
          if (r.getLong(3) > 0 && r.getLong(2) == 0) 1 else 0))
        .toDF("component", "ok")
        .orderBy(col("component"))
    }),

    // q182: the ORC face of the q136/q170 losslessness contract — the
    // documents table written as zstd ORC with id bloom filters and
    // read back through the schema-ASSERTED path (self-describing
    // formats drift silently; the checked read throws on a renamed
    // column or narrowed type instead of null-filling). The oracle
    // compares against the parquet original, so any value or
    // empty-vs-null loss through the third interchange format breaks
    // the hash.
    "q182_orc_roundtrip" -> ((s, d) => {
      import graft.sources.OrcSource
      val path = "/tmp/graft_q182_orc"
      OrcSource.write(Tables.documents(s, d), path)
      OrcSource.readDocuments(s, path)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // q184: the TOKENIZERS through the SQL frontend — the q162/q173/
    // q178 story for the asset layer: a SQL-only user encodes with
    // the same committed constants (BPE merges, unigram pieces) via
    // registered functions + LATERAL VIEW posexplode, and both legs
    // hash-match the generated recursive-CTE oracles — so DataFrame,
    // SQL, and DuckDB replay produce the identical token streams.
    // (unigram_ids is registered too, but Viterbi is oracle-
    // inexpressible — q180/q181 own that face.)
    "q184_sql_tokenize" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      GraftSession.widen(Tables.documents(s, d))
        .createOrReplaceTempView("documents")
      s.sql("""
        SELECT 'bpe' AS form, doc_id, CAST(pos AS BIGINT) AS pos, token_id
        FROM documents LATERAL VIEW posexplode(bpe_ids(text)) t AS pos, token_id
        UNION ALL
        SELECT 'maxmatch', doc_id, CAST(pos AS BIGINT), token_id
        FROM documents LATERAL VIEW posexplode(maxmatch_ids(text)) t AS pos, token_id
        ORDER BY form, doc_id, pos""")
    }),

    // q185: INCREMENTAL shard refresh — the delta-delivery form of
    // q183: initial delivery (ids with id%5≠4), then one refresh wave
    // carrying adds (id%5=4), edits (initial ids with id%7=0 get
    // " v2" appended, n_chars+3) and deletes (initial ids with
    // id%11=3, minus the edit overlap — ids must be unique across the
    // delta). Only the shards the delta hashes into are rewritten
    // (partition-pruned read + dynamic partition overwrite; untouched
    // directories keep their exact files — specced). The manifest is
    // read from the refreshed FILES and hash-compared against the
    // upserted corpus recomputed in SQL — a stale, lost, duplicated,
    // or misrouted row after the partial rewrite breaks the gate.
    "q185_shard_refresh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val path = "/tmp/graft_q185_shards"
      graft.sources.Sinks.sharded(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 4), path,
        nShards = 16, idCol = "doc_id")
      val edits = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4 &&
          pmod(col("doc_id"), lit(7)) === 0)
        .withColumn("text", concat(col("text"), lit(" v2")))
        .withColumn("n_chars", col("n_chars") + 3)
      val adds = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
      val deletes = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4 &&
          pmod(col("doc_id"), lit(11)) === 3 &&
          pmod(col("doc_id"), lit(7)) =!= 0)
        .select(col("doc_id"))
      graft.sources.Sinks.shardedRefresh(s, path,
        adds.unionByName(edits), deletes, nShards = 16, idCol = "doc_id")
      graft.sources.Sinks.shardManifest(s, path)
    }),

    // q187: MAINTAINED champion tier — the serving tier kept warm by
    // the streaming maintenance loop instead of dropped-and-forgotten:
    // replayUpserts with maintainChampions rebuilds the tier after
    // every append-carrying batch (index-sized work — postings ⋈ terms
    // ⋈ stats, no corpus scan; pending tombstones force the compaction
    // a warm tier requires). After three add waves the standing tier
    // must equal a from-scratch selection over the full corpus, so the
    // oracle is q175's champion CTE verbatim: selection on 4dp-rounded
    // weights, candidate-bounded rescore, top-10. The spec proves the
    // same through an edit/delete schedule.
    "q187_maintained_champions" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      graft.streaming.IndexMaintenance.initStores(s, "graft_q187_idx")
      graft.streaming.IndexMaintenance.replayUpserts(docs, "graft_q187_idx",
        nBatches = 3, buckets = 8, maintainChampions = Some(32))
      val qTerms = Tables.documents(s, d).filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("t"))
        .distinct().collect().map(_.getString(0)).toSeq
      graft.operators.Bm25.scoreIndexedTopK(s, "graft_q187_idx", qTerms, 10)
        .select(col("rank"), col("doc_id"), col("n_matched"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy(col("rank"))
    }),

    // q198: the asymmetric BQ pipeline through the SQL frontend (the
    // q162/q173/q178/q184 three-surface discipline for the new
    // serving layer): sign_pack / bq_asym_dot / cosine_sim as
    // registered functions, candidate cut and rerank as plain window
    // SQL — hash-matched to q193's DataFrame path by sharing its
    // oracle verbatim.
    "q198_sql_bq" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.embeddings(s, d).createOrReplaceTempView("bq_embeddings")
      s.sql("""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM bq_embeddings WHERE vec_id % 50 = 0),
        codes AS (SELECT vec_id, embedding, sign_pack(embedding) AS bq
               FROM bq_embeddings),
        scored AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
            bq_asym_dot(q.qvec, c.bq) AS asym,
            cosine_sim(c.embedding, q.qvec) AS cos
          FROM codes c CROSS JOIN q),
        cand AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY asym DESC, neighbor_id) AS ark
          FROM scored),
        rer AS (
          SELECT query_id, neighbor_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM cand WHERE ark <= 50)
        SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
        FROM rer WHERE rank <= 10 ORDER BY query_id, rank""")
    }),

    // q199: the GRAPH-family ANN backend (NSW small-world) under the
    // constant-truth gate — recall/MRR/nDCG floors vs the exact
    // oracle, the q130 pattern for the sixth backend. Four hash
    // shards build independent in-memory proximity graphs in one
    // mapPartitions pass; the query batch beam-searches every shard
    // and a global top-k merges the union, so the gate also certifies
    // the cross-shard merge (a dropped shard or a broken merge floors
    // recall immediately).
    "q199_nsw_gate" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val results = nsw4(s, d).knnJoin(queries, topK = 10, ef = 80)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"), col("rank"))
      val truth = graft.operators.KnnExact.knnBatch(e, queries, 10)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
          (lit(11) - col("rank")).cast("double").as("grade"))
      val m = graft.operators.RetrievalEval.metrics(results, truth, k = 10)
        .agg(avg(col("recall")).as("r"), avg(col("mrr")).as("m"), avg(col("ndcg")).as("n"))
        .head()
      // filtered serving under the same gate: admission-flagged beam
      // vs the exact kNN over the filtered corpus
      val allowed = e.filter(col("label") % 2 === 0).select(col("vec_id"))
      val fGot = nsw4(s, d).knnJoinFiltered(queries, allowed, topK = 5, ef = 80)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"), col("rank"))
      val fTruth = graft.operators.KnnExact.knnBatch(
          e.join(allowed, Seq("vec_id")), queries, 5)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
          (lit(6) - col("rank")).cast("double").as("grade"))
      val fr = graft.operators.RetrievalEval.metrics(fGot, fTruth, k = 5)
        .agg(avg(col("recall"))).head().getDouble(0)
      import s.implicits._
      Seq(
        ("filtered_recall5_floor_090", if (fr >= 0.90) 1 else 0),
        ("mrr_self_exact", if (m.getDouble(1) == 1.0) 1 else 0),
        ("ndcg10_floor_090", if (m.getDouble(2) >= 0.90) 1 else 0),
        ("recall10_floor_090", if (m.getDouble(0) >= 0.90) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q200: curriculum ordering — deterministic lexical difficulty
    // (mean word length, type-token ratio, log length), quantile
    // phases easy→hard, reproducible intra-phase rank. The phase cut
    // is ntile ARITHMETIC on a zipWithIndex position over the
    // range-partitioned sort (no unpartitioned window anywhere — the
    // corpus never converges on one task); the oracle replays the
    // same score and uses DuckDB's actual ntile window, so the gate
    // also certifies the arithmetic ≡ ntile equivalence.
    "q200_curriculum" -> ((s, d) => {
      graft.operators.Curriculum.phases(Tables.documents(s, d), numPhases = 4)
        .orderBy(col("phase"), col("rank_in_phase"))
    }),

    // q207: SOURCE-INTERLEAVED curriculum — within each difficulty
    // phase the read order rotates across sources (dataloader balance
    // stacked on easy→hard). Grouped ranks via GlobalOrder sorts plus
    // exact offsets (min global position per (phase, source);
    // ntile-arithmetic phase offsets) — still zero windows; the
    // oracle's nested row_number windows certify the equivalence.
    "q207_curriculum_interleave" -> ((s, d) => {
      graft.operators.Curriculum.interleaved(
          Tables.documents(s, d), numPhases = 4)
        .orderBy(col("phase"), col("read_pos"))
    }),

    // q208: the GRAPH store under the gated-ingest fold (round-10
    // verdict #1) — one admission decision maintains the BM25 index
    // AND a standing NSW store through `nswStoreFold`. Because an NSW
    // shard rebuild is bit-identical to a fresh fit of its live rows
    // (and upsertStore purges departures in the same pass), the gate
    // pins EXACT equality bits — maintained table ≡ fresh-fit save of
    // the live set, table-served top-k ≡ fresh-model-served — strictly
    // stronger than the recall floors the forest/IVF folds (q171)
    // settle for. Waves replay q171's schedule, so the deterministic
    // halves reuse its admitted-CTE oracle counts verbatim.
    "q208_nsw_fold" -> ((s, d) => {
      import s.implicits._
      import graft.streaming.IndexMaintenance
      val idx = "graft_q208_idx"; val sig = "graft_q208_sigs"
      val store = "graft_q208_nsw"; val freshT = store + "_fresh"
      IndexMaintenance.initStores(s, idx)
      graft.streaming.IngestDedup.initStore(s, sig)
      graft.sources.Sinks.dropTable(s, sig + "_pending_rm")
      for (t <- Seq(store, store + "_params", freshT, freshT + "_params"))
        graft.sources.Sinks.dropTable(s, t)
      val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .join(Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
        .localCheckpoint()
      // ONE add wave (r12 trim — was two): the admitted set is
      // wave-count-independent, and the NSW fold still sees bootstrap
      // (wave 1), upsert-into-existing (the edit wave's put side runs
      // upsertStore's touched-shard rebuild), edits and takedowns.
      // NswStoreSpec drives the multi-add-wave schedule in full.
      // the HIERARCHICAL backend under the fold (q213's HNSW stack —
      // the best-recall config is the one a real pipeline maintains;
      // levels reproduce from ids, so the exact equality bits hold
      // for hierarchy mode identically)
      val nsw = graft.ann.NswGraph(m = 8, efConstruction = 32,
        numShards = 4, seed = 7L, hierarchy = true)
      val fold = IndexMaintenance.nswStoreFold(s, nsw, store)
      IndexMaintenance.applyGatedUpserts(s, idx, sig, corpus,
        ver = 1L, buckets = 8, vecFold = Some(fold))
      val live3 = s.table(idx + "_doclens").select(col("doc_id")).localCheckpoint()
      val edits = corpus.join(live3, Seq("doc_id"), "left_semi")
        .filter(pmod(col("doc_id"), lit(10)) === 1)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          col("embedding"))
      val dels = live3.filter(pmod(col("doc_id"), lit(10)) === 2)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(null).cast("array<float>").as("embedding"))
      val d4 = IndexMaintenance.applyGatedUpserts(s, idx, sig,
        edits.unionByName(dels), ver = 4L, buckets = 8, vecFold = Some(fold))
        .localCheckpoint()
      val nEdited = d4.filter(col("status") === "changed").count()
      val nRemoved = d4.filter(col("status") === "removed").count()
      val tomb =
        if (s.catalog.tableExists(idx + "_tombstones"))
          s.table(idx + "_tombstones").select(col("doc_id"))
        else s.range(0).select(col("id").as("doc_id"))
      val liveIds = s.table(idx + "_doclens").select(col("doc_id"))
        .join(tomb, Seq("doc_id"), "left_anti").localCheckpoint()
      val liveCorpus = corpus.join(liveIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("embedding")).localCheckpoint()
      // the EXACT half: maintained store table ≡ a fresh fit of the
      // live set saved under the same frozen geometry (one fit serves
      // both the table comparison and the serve-parity leg)
      val freshModel = nsw.fit(liveCorpus, "doc_id", "embedding")
      graft.ann.NswStore.saveStore(freshModel, freshT)
      val a = s.table(store); val b = s.table(freshT)
      val storeEq = a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty
      val storeIds = a.select(col("node_id").as("doc_id")).distinct()
        .localCheckpoint()
      val idsSubset = storeIds.exceptAll(liveIds).isEmpty
      // the store holds exactly the first-seen-deduped live vectors
      // (the fit's D2 dedup — bit-dup embeddings keep one id)
      val coverOk = storeIds.count() ==
        Dedup.exactVectors(liveCorpus, "embedding", "doc_id").count()
      // serve parity STRAIGHT OFF the maintained table vs the fresh
      // in-memory model — certifies the store read path restores
      // whole-shard routing (the round-9 advisory's bug class)
      val queries = liveCorpus.filter(col("doc_id") < 40)
        .select(col("doc_id").as("query_id"), col("embedding").as("qvec"))
      def keyed(df: DataFrame) =
        df.select(col("query_id"), col("rank"), col("neighbor_id"))
      val sv = keyed(graft.ann.NswStore.knnJoinStore(s, store, queries,
        topK = 5, ef = 64))
      val fv = keyed(freshModel.knnJoin(queries, topK = 5, ef = 64))
      val serveEq = sv.exceptAll(fv).unionAll(fv.exceptAll(sv)).isEmpty
      Seq(
        ("n_edited", nEdited),
        ("n_live", liveIds.count()),
        ("n_removed", nRemoved),
        ("nsw_covers_deduped_live", if (coverOk) 1L else 0L),
        ("nsw_ids_subset_live", if (idsSubset) 1L else 0L),
        ("nsw_serve_eq_fresh", if (serveEq) 1L else 0L),
        ("nsw_store_eq_fresh", if (storeEq) 1L else 0L))
        .toDF("component", "val")
        .orderBy(col("component"))
    }),

    // q245: the COUNT-MODEL stores under the gated-ingest fold
    // (round-10 verdict #1) — ONE admission decision now maintains
    // the text index AND the NB classifier, trigram LM and weighted
    // sample stores, through `countStoreFold` + the CorpusLog
    // (departing docs' OLD payload resolved from the prefix-pruned
    // log for the signed subtractions). Waves replay q171/q208's
    // schedule, so the deterministic halves reuse its admitted-CTE
    // oracle counts verbatim; the store halves are EXACT equality
    // bits — count additivity makes maintained ≡
    // fresh-fit-of-the-live-set hold bit-for-bit (the q218/q219
    // equality, now under the admission gate), and the sample
    // equality holds by the dropDocs superset argument. The
    // union-only sketch families (HLL/HH/KLL) moved to q252's
    // deferred-takedown gate in round 12 (the r11 gate-wall trim:
    // their legs here re-paid a corpus pass q252 now gates more
    // strongly, with deferral).
    "q245_store_fold" -> ((s, d) => {
      import s.implicits._
      import graft.streaming.{CorpusLog, IndexMaintenance, IngestDedup}
      import graft.operators.{CountStore, LmStore, NbStore, SampleStore}
      val idx = "graft_q245_idx"; val sig = "graft_q245_sigs"
      val log = "graft_q245_log"
      val nb = "graft_q245_nb"; val lm = "graft_q245_lm"
      val smp = "graft_q245_smp"
      val (fnb, flm, fsmp) = ("graft_q245_fnb", "graft_q245_flm",
        "graft_q245_fsmp")
      IndexMaintenance.initStores(s, idx)
      IngestDedup.initStore(s, sig)
      graft.sources.Sinks.dropTable(s, sig + "_pending_rm")
      for (t <- Seq(log, log + "_applied",
          nb + "_counts", nb + "_class", lm + "_tri", lm + "_bi", lm + "_uni",
          smp + "_sample", smp + "_sample_params",
          "graft_q245_hll_hll", "graft_q245_hll_hll_params",
          fnb + "_counts", fnb + "_class", flm + "_tri", flm + "_bi",
          flm + "_uni", fsmp + "_sample", fsmp + "_sample_params"))
        graft.sources.Sinks.dropTable(s, t)
      for (n <- Seq(log, log + "__compact", nb, lm, smp, fnb, flm, fsmp))
        CountStore.setBuilding(s, n, on = false)
      val corpus = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .localCheckpoint()
      // ONE add wave (r12 trim — was two): the admitted set (hence
      // the oracle counts) is wave-count-independent because
      // admission is order-independent, and every fold path a second
      // add wave exercised is still exercised — bootstrap by wave 1,
      // append-INTO-EXISTING by the edit wave's put side (signed
      // "+new" merges into standing NB/LM tables, sample top-k
      // combine), signed removal by the edit/takedown wave.
      // CountFoldSpec drives the multi-add-wave schedule in full.
      val fold = IndexMaintenance.countStoreFold(s,
        nbStore = Some((nb, "lang")), lmStore = Some(lm),
        sampleStore = Some((smp, "source", "n_chars")), sampleK = 5,
        buckets = 8)
      IndexMaintenance.applyGatedUpserts(s, idx, sig, corpus,
        ver = 1L, buckets = 8, docFold = Some((log, fold)))
      val live3 = s.table(idx + "_doclens").select(col("doc_id")).localCheckpoint()
      // wave 4: edits (%10==1 — new text AND heavier weight, so the
      // sample's max-weight stale-claim path is exercised) + takedowns
      val edits = corpus.join(live3, Seq("doc_id"), "left_semi")
        .filter(pmod(col("doc_id"), lit(10)) === 1)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          col("lang"), col("source"), (col("n_chars") + 7).as("n_chars"))
      val dels = live3.filter(pmod(col("doc_id"), lit(10)) === 2)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(null).cast("string").as("lang"),
          lit(null).cast("string").as("source"),
          lit(null).cast("long").as("n_chars"))
      val d4 = IndexMaintenance.applyGatedUpserts(s, idx, sig,
        edits.unionByName(dels), ver = 4L, buckets = 8,
        docFold = Some((log, fold)))
        .localCheckpoint()
      val nEdited = d4.filter(col("status") === "changed").count()
      val nRemoved = d4.filter(col("status") === "removed").count()
      // the live admitted corpus, constructed INDEPENDENTLY of the log
      // (index doclens minus tombstones, edit rule applied) — the log's
      // live view must equal it, and the fresh fits consume it
      val tomb =
        if (s.catalog.tableExists(idx + "_tombstones"))
          s.table(idx + "_tombstones").select(col("doc_id"))
        else s.range(0).select(col("id").as("doc_id"))
      val liveIds = s.table(idx + "_doclens").select(col("doc_id"))
        .join(tomb, Seq("doc_id"), "left_anti").localCheckpoint()
      val liveCorpus = corpus.join(liveIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(10)) === 1,
            concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"),
          col("lang"), col("source"),
          when(pmod(col("doc_id"), lit(10)) === 1, col("n_chars") + 7)
            .otherwise(col("n_chars")).as("n_chars"))
        .localCheckpoint()
      // symmetric-difference probes as ONE job per comparison (union
      // of both exceptAll legs), not two — the equality bits are the
      // gate's dominant job count
      def symEq(x: org.apache.spark.sql.DataFrame,
          y: org.apache.spark.sql.DataFrame) =
        x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty
      val logLive = CorpusLog.live(s, log, "doc_id")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val logOk = symEq(logLive, liveCorpus)
      NbStore.initStore(liveCorpus, fnb, buckets = 8, labelCol = "lang")
      LmStore.initStore(liveCorpus, flm, buckets = 8)
      SampleStore.initStore(liveCorpus, fsmp, "source", "doc_id", "n_chars", k = 5)
      def eq(a: String, b: String) = symEq(s.table(a), s.table(b))
      val nbOk = eq(nb + "_counts", fnb + "_counts") && eq(nb + "_class", fnb + "_class")
      val lmOk = eq(lm + "_tri", flm + "_tri") && eq(lm + "_bi", flm + "_bi") &&
        eq(lm + "_uni", flm + "_uni")
      val smpOk = eq(smp + "_sample", fsmp + "_sample")
      Seq(
        ("lm_store_eq_fresh", if (lmOk) 1L else 0L),
        ("log_live_eq_expected", if (logOk) 1L else 0L),
        ("n_edited", nEdited),
        ("n_live", liveIds.count()),
        ("n_removed", nRemoved),
        ("nb_store_eq_fresh", if (nbOk) 1L else 0L),
        ("sample_store_eq_fresh", if (smpOk) 1L else 0L))
        .toDF("component", "val")
        .orderBy(col("component"))
    }),

    // q246: the HEAVY-HITTERS store (round-10 verdict #3) — per-group
    // Misra-Gries summaries under the CountStore lifecycle: "top
    // n-grams per source" with GROUPS-sized state (≤ k counters per
    // group), the standing feed the q139 decontamination path wants.
    // The MG guarantees are deterministic, so the gate pins them as
    // exact bits against a full fixture-scale recompute: estimates
    // never overcount, undercount ≤ the exactly-tracked cumulative
    // offset d (which itself must sit under the classic n_grp/(k+1)
    // envelope while no removal ran), every true heavy above d is
    // present, the group totals fold exactly, and no group exceeds k
    // counters. Round-12 adds the NON-HEAVY TAKEDOWN wave: a
    // departure whose (grp, item) pairs are all untracked is removed
    // EXACTLY in place (one n subtraction, no corpus pass —
    // removeDocsExact), after which the reduced-corpus truth must
    // still satisfy every guarantee under the UNCHANGED d bound (the
    // soundness argument the r11 verdict asked to be proven: n
    // shrank, d did not, and d is the bound that survives).
    // n_groups is the oracle-mirrored deterministic count.
    "q246_hh_store" -> ((s, d) => {
      import s.implicits._
      import graft.operators.{CountStore, HhStore}
      val name = "graft_q246_hh"
      for (t <- Seq(name + "_hh", name + "_hh_n", name + "_hh_params",
          name + "_applied", name + "_stale"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, name, on = false)
      val grams = Tables.documents(s, d)
        .select(col("source").as("grp"),
          explode(expr(
            """transform(sequence(1, greatest(size(split(lower(trim(text)), '\\s+')) - 2, 1)),
               i -> concat_ws(' ', slice(split(lower(trim(text)), '\\s+'), i, 3)))"""))
            .as("item"))
        .localCheckpoint()
      val k = 50
      HhStore.initStore(grams.filter(xxhash64(col("item")) % 2 === 0),
        name, "grp", "item", k)
      HhStore.applyBatch(grams.filter(xxhash64(col("item")) % 2 =!= 0),
        name, "grp", "item", batchId = 1L)
      val truth = grams.groupBy("grp", "item").agg(count(lit(1)).as("t"))
      val n = grams.groupBy("grp").agg(count(lit(1)).as("n"))
      val store = s.table(name + "_hh").localCheckpoint()
      val nTbl = s.table(name + "_hh_n")
      val joined = store.join(truth, Seq("grp", "item"))
        .join(n, Seq("grp"))
        .join(nTbl.select(col("grp"), col("d")), Seq("grp"))
        .select(col("cnt"), col("t"), col("d"),
          floor(col("n") / (k + 1)).as("bound"))
        .localCheckpoint()
      val estLe = joined.filter(col("cnt") > col("t")).isEmpty
      val underOk = joined.filter(col("t") - col("cnt") > col("d")).isEmpty
      // d ≤ floor(n/(k+1)): the exact bound never exceeds the classic
      // one while the store is removal-free
      val dLeClassic = nTbl.join(n, Seq("grp"))
        .filter(col("d") > floor(n("n") / (k + 1))).isEmpty
      val heaviesOk = truth
        .join(nTbl.select(col("grp"), col("d")), Seq("grp"))
        .filter(col("t") > col("d"))
        .join(store, Seq("grp", "item"), "left_anti").isEmpty
      val nExact = nTbl
        .join(n, Seq("grp"))
        .filter(nTbl("n") =!= n("n")).isEmpty
      val boundedK = store.groupBy("grp").count()
        .filter(col("count") > k).isEmpty
      // --- the NON-HEAVY takedown wave (round-12) ---
      // departures = every occurrence of a deterministic slice of the
      // UNTRACKED (grp, item) pairs; all their occurrences leave, so
      // the reduced-corpus truth is the original truth minus those
      // pairs entirely
      val goneItems = grams
        .join(store.select(col("grp"), col("item")),
          Seq("grp", "item"), "left_anti")
        .filter(xxhash64(col("grp"), col("item")) % 5 === 0)
        .localCheckpoint()
      val tookExact = HhStore.removeDocsExact(goneItems, name, "grp", "item")
      val truth2 = truth.join(goneItems.select("grp", "item").distinct(),
        Seq("grp", "item"), "left_anti")
      val n2 = grams.join(goneItems.select("grp", "item").distinct(),
        Seq("grp", "item"), "left_anti")
        .groupBy("grp").agg(count(lit(1)).as("n"))
      val nTbl2 = s.table(name + "_hh_n")
      val postNExact = nTbl2.join(n2, Seq("grp"))
        .filter(nTbl2("n") =!= n2("n")).isEmpty
      val postJoined = s.table(name + "_hh")
        .join(truth2, Seq("grp", "item"))
        .join(nTbl2.select(col("grp"), col("d")), Seq("grp"))
        .select(col("cnt"), col("t"), col("d"))
        .localCheckpoint()
      val postEstLe = postJoined.filter(col("cnt") > col("t")).isEmpty
      val postUnderOk = postJoined.filter(col("t") - col("cnt") > col("d")).isEmpty
      val postHeaviesOk = truth2
        .join(nTbl2.select(col("grp"), col("d")), Seq("grp"))
        .filter(col("t") > col("d"))
        .join(s.table(name + "_hh"), Seq("grp", "item"), "left_anti").isEmpty
      Seq(
        ("counters_le_k", if (boundedK) 1L else 0L),
        ("d_le_classic_bound", if (dLeClassic) 1L else 0L),
        ("est_le_true", if (estLe) 1L else 0L),
        ("heavies_all_present", if (heaviesOk) 1L else 0L),
        ("n_groups", s.table(name + "_hh_n").count()),
        ("n_tracked_exact", if (nExact) 1L else 0L),
        ("takedown_exact_applied", if (tookExact) 1L else 0L),
        ("takedown_post_est_le_true", if (postEstLe) 1L else 0L),
        ("takedown_post_heavies_present", if (postHeaviesOk) 1L else 0L),
        ("takedown_post_n_exact", if (postNExact) 1L else 0L),
        ("takedown_post_under_le_d", if (postUnderOk) 1L else 0L),
        ("undercount_within_bound", if (underOk) 1L else 0L))
        .toDF("component", "val").orderBy(col("component"))
    }),

    // q247: the MG state under a FULL cross-engine oracle — the merge
    // arithmetic is deterministic integers (count, rank with item
    // tiebreak, offset subtraction), so DuckDB replays BOTH waves'
    // compress steps and the serve must hash-match row for row: the
    // strongest possible gate for a sketch (state equality, not just
    // bound satisfaction). Split is the q49 portable hash; items are
    // word tokens per source.
    "q247_hh_serve" -> ((s, d) => {
      import graft.operators.{CountStore, HhStore}
      val name = "graft_q247_hh"
      for (t <- Seq(name + "_hh", name + "_hh_n", name + "_hh_params",
          name + "_applied"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, name, on = false)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val toks = Tables.documents(s, d)
        .select(col("source").as("grp"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("item"),
          (h % 2).as("w"))
        .localCheckpoint()
      HhStore.initStore(toks.filter(col("w") === 0), name, "grp", "item", k = 20)
      HhStore.applyBatch(toks.filter(col("w") === 1), name, "grp", "item", 1L)
      HhStore.topHitters(s, name, n = 10)
        .orderBy(col("grp"), col("rank"))
    }),

    // q248: the QUANTILE sketch store (round-10 verdict #6) —
    // per-group KLL under the CountStore lifecycle: standing
    // length-distribution tracking (the Drift surface's feed). KLL
    // compaction is randomized, so the gate pins the PUBLISHED
    // guarantee instead of sketch bytes (declared statistical-oracle
    // policy, the ANN recall discipline): each served percentile's
    // realized rank window must intersect [p ± 3ε(k)] in every group
    // (tie-aware: the strict-below and inclusive ranks bracket the
    // returned value), while the tracked n stays EXACT and the group
    // count is oracle-mirrored.
    "q248_quantile_store" -> ((s, d) => {
      import s.implicits._
      import graft.operators.{CountStore, QuantileStore}
      val name = "graft_q248_kll"
      for (t <- Seq(name + "_kll", name + "_kll_params", name + "_applied"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, name, on = false)
      val k = 200
      val eps = graft.functions.KllSketch.normalizedRankError(k)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val docs = Tables.documents(s, d)
        .select(col("source").as("grp"),
          col("n_chars").cast("double").as("v"), (h % 2).as("w"))
        .localCheckpoint()
      QuantileStore.initStore(docs.filter(col("w") === 0), name, "grp", "v", k)
      QuantileStore.applyBatch(docs.filter(col("w") === 1), name, "grp", "v", 1L)
      val served = QuantileStore.quantiles(s, name, Seq(0.1, 0.5, 0.9))
      val aggCols: Seq[org.apache.spark.sql.Column] =
        Seq(count(lit(1)).as("n_true"), first(col("n")).as("n_served")) ++
          Seq(0.1, 0.5, 0.9).flatMap { p =>
            val q = col(s"p${(p * 100).round}")
            Seq((sum(when(col("v") < q, 1).otherwise(0)) / count(lit(1)))
                .as(s"lo${(p * 100).round}"),
              (sum(when(col("v") <= q, 1).otherwise(0)) / count(lit(1)))
                .as(s"hi${(p * 100).round}"))
          }
      val joined = docs.join(served, Seq("grp"))
        .groupBy(col("grp"))
        .agg(aggCols.head, aggCols.tail: _*)
        .localCheckpoint()
      def rankOk(p: Double): Boolean = {
        val pct = (p * 100).round
        joined.filter(col(s"lo$pct") > p + 3 * eps ||
          col(s"hi$pct") < p - 3 * eps).isEmpty
      }
      val nExact = joined.filter(col("n_true") =!= col("n_served")).isEmpty
      Seq(
        ("n_exact", if (nExact) 1L else 0L),
        ("n_groups", served.count()),
        ("rank_within_eps_p10", if (rankOk(0.1)) 1L else 0L),
        ("rank_within_eps_p50", if (rankOk(0.5)) 1L else 0L),
        ("rank_within_eps_p90", if (rankOk(0.9)) 1L else 0L))
        .toDF("component", "val").orderBy(col("component"))
    }),

    // q249: the quantile store's SQL serve face — a SQL-only user
    // reads the standing sketch table with the registered
    // kll_n/kll_quantile scalars. The EXACT leg (per-group n) is
    // hash-matched against DuckDB's count; the quantile leg is an
    // in-engine equality bit (SQL-served ≡ Column-served over the
    // SAME stored sketch — deterministic given the sketch, the only
    // honest cross-surface check for a randomized summary). Store
    // shared with q248's schedule via StoreCache (the q209 serve
    // pattern).
    "q249_sql_quantile_serve" -> ((s, d) => {
      import graft.operators.{CountStore, QuantileStore}
      GraftSession.registerFunctions(s)
      val name = "graft_q249_kll"
      graft.sources.StoreCache.table(s, name, s"kll|200|r11|$d",
        Seq(name + "_kll", name + "_kll_params")) {
        for (t <- Seq(name + "_kll", name + "_kll_params", name + "_applied"))
          graft.sources.Sinks.dropTable(s, t)
        CountStore.setBuilding(s, name, on = false)
        QuantileStore.initStore(
          Tables.documents(s, d).select(col("source").as("grp"),
            col("n_chars").cast("double").as("v")),
          name, "grp", "v", k = 200)
      }
      val viaSql = s.sql(
        s"""SELECT grp, kll_n(sk) AS n, kll_quantile(sk, 0.5d) AS med
            FROM ${name}_kll""")
      val viaCol = s.table(name + "_kll")
        .select(col("grp"), QuantileStore.kllN(col("sk")).as("n"),
          QuantileStore.kllQuantile(col("sk"), lit(0.5)).as("med"))
      val eqBit = viaSql.exceptAll(viaCol)
        .unionAll(viaCol.exceptAll(viaSql)).isEmpty
      viaSql.select(col("grp"), col("n"),
          lit(if (eqBit) 1 else 0).as("sql_eq_df"))
        .orderBy(col("grp"))
    }),

    // q250: the DECONTAMINATION CONSUMER of the heavy-hitters store —
    // the composition the r10 verdict named (the q139 path fed by a
    // standing asset instead of a per-run benchmark scan): benchmark
    // docs' 3-gram shingles maintain a per-lang HH store across two
    // waves; the corpus drops any doc containing one of its lang's
    // top-20 tracked shingles. At the gate fixture the store runs in
    // MG's exact regime (distinct shingles per lang ≪ k, so
    // compression never fires — q247 separately gates the compressed
    // state), making the whole composition exactly DuckDB-mirrorable:
    // counts, tie-broken top-20, containment, per-lang keep/drop.
    "q250_hh_decontaminate" -> ((s, d) => {
      import graft.operators.{CountStore, HhStore}
      val name = "graft_q250_hh"
      for (t <- Seq(name + "_hh", name + "_hh_n", name + "_hh_params",
          name + "_applied"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, name, on = false)
      val docs = Tables.documents(s, d).localCheckpoint()
      val shingles = docs.filter(col("doc_id") % 97 === 0)
        .select(col("lang").as("grp"),
          explode(expr(
            """transform(sequence(1, greatest(size(split(lower(trim(text)), '\\s+')) - 2, 1)),
               i -> concat_ws(' ', slice(split(lower(trim(text)), '\\s+'), i, 3)))"""))
            .as("item"))
      HhStore.initStore(shingles.filter(xxhash64(col("item")) % 2 === 0),
        name, "grp", "item", k = 50000)
      HhStore.applyBatch(shingles.filter(xxhash64(col("item")) % 2 =!= 0),
        name, "grp", "item", batchId = 1L)
      val flagged = HhStore.topHitters(s, name, n = 20)
        .select(col("grp").as("lang"), col("item"))
      val corpusShingles = docs
        .select(col("doc_id"), col("lang"),
          explode(expr(
            """transform(sequence(1, greatest(size(split(lower(trim(text)), '\\s+')) - 2, 1)),
               i -> concat_ws(' ', slice(split(lower(trim(text)), '\\s+'), i, 3)))"""))
            .as("item"))
      val contaminated = corpusShingles
        .join(flagged, Seq("lang", "item"), "left_semi")
        .select(col("doc_id")).distinct()
      docs
        .join(contaminated.withColumn("__c", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__c").isNotNull, 1).otherwise(0)).as("n_dropped"))
        .orderBy(col("lang"))
    }),

    // q264: FEDERATED decontamination (round 14) — a merged store
    // making a real curation DECISION, the consumer capstone on
    // q258's federation: two benchmark shards (%32 ∈ {2, 18} — "two
    // eval suites maintained on two teams' clusters") are
    // shingle-sketched into two standing per-lang HH stores;
    // mergeStores combines them at the coordinator (exact regime,
    // groups-sized, no benchmark re-scan), and the corpus drops every
    // doc containing a MERGED top-20 shingle — q250's composition
    // riding a federated asset. The oracle replays the whole
    // composition (union benchmark counts → tie-broken top-20 →
    // containment → per-lang keep/drop) in DuckDB.
    "q264_federated_decontaminate" -> ((s, d) => {
      import graft.operators.{CountStore, HhStore}
      val (a, b, out) = ("graft_q264_a", "graft_q264_b", "graft_q264_fed")
      val docs = Tables.documents(s, d).localCheckpoint()
      val shingleExpr = expr(
        """transform(sequence(1, greatest(size(split(lower(trim(text)), '\\s+')) - 2, 1)),
           i -> concat_ws(' ', slice(split(lower(trim(text)), '\\s+'), i, 3)))""")
      for ((n, m) <- Seq((a, 2), (b, 18))) {
        graft.sources.StoreCache.table(s, n, s"hhdecfed32|$n|r14|$d",
          Seq(n + "_hh", n + "_hh_n", n + "_hh_params")) {
          for (t <- Seq(n + "_hh", n + "_hh_n", n + "_hh_params",
              n + "_applied"))
            graft.sources.Sinks.dropTable(s, t)
          CountStore.setBuilding(s, n, on = false)
          HhStore.initStore(docs.filter(col("doc_id") % 32 === m)
              .select(col("lang").as("grp"), explode(shingleExpr).as("item")),
            n, "grp", "item", k = 50000)
        }
      }
      for (t <- Seq(out + "_hh", out + "_hh_n", out + "_hh_params"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, out, on = false)
      HhStore.mergeStores(s, a, b, out)
      val flagged = HhStore.topHitters(s, out, n = 20)
        .select(col("grp").as("lang"), col("item"))
      val contaminated = docs
        .select(col("doc_id"), col("lang"), explode(shingleExpr).as("item"))
        .join(flagged, Seq("lang", "item"), "left_semi")
        .select(col("doc_id")).distinct()
      docs
        .join(contaminated.withColumn("__c", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__c").isNotNull, 1).otherwise(0)).as("n_dropped"))
        .orderBy(col("lang"))
    }),

    // q251: the heavy-hitters store served from PLAIN SQL (the q225
    // discipline — the store is ordinary catalog tables, so a SQL-only
    // user replays the serve: rank window over the ≤k counters + the
    // exact-d envelope join), sharing q247's wave schedule via
    // StoreCache and its full MG-replay oracle VERBATIM.
    "q251_sql_hh_serve" -> ((s, d) => {
      import graft.operators.{CountStore, HhStore}
      val name = "graft_q251_hh"
      graft.sources.StoreCache.table(s, name, s"hhstore|20|r11|$d",
        Seq(name + "_hh", name + "_hh_n", name + "_hh_params")) {
        for (t <- Seq(name + "_hh", name + "_hh_n", name + "_hh_params",
            name + "_applied"))
          graft.sources.Sinks.dropTable(s, t)
        CountStore.setBuilding(s, name, on = false)
        val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(4294967296L))
        val toks = Tables.documents(s, d)
          .select(col("source").as("grp"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("item"),
            (h % 2).as("w"))
          .localCheckpoint()
        HhStore.initStore(toks.filter(col("w") === 0), name, "grp", "item",
          k = 20)
        HhStore.applyBatch(toks.filter(col("w") === 1), name, "grp", "item", 1L)
      }
      s.sql(
        s"""WITH ranked AS (
              SELECT grp, item, cnt, row_number() OVER (
                PARTITION BY grp ORDER BY cnt DESC, item) AS rank
              FROM ${name}_hh)
            SELECT r.grp, CAST(r.rank AS INT) AS rank, r.item, r.cnt,
              CAST(r.cnt + n.d AS BIGINT) AS cnt_hi
            FROM ranked r JOIN ${name}_hh_n n USING (grp)
            WHERE r.rank <= 10 ORDER BY grp, rank""")
    }),

    // q252: DEFERRED union-only takedowns under the gated fold (the
    // r11 verdict's TOP item; sample family added r13) — a trickle of
    // takedown batches used to cost one live-corpus pass PER BATCH
    // for EACH attached non-invertible-or-live-reading family (HLL +
    // HH + KLL re-inits, the sample's departure refit = up to four
    // corpus passes per wave); with `refitBacklog` = 2, departure
    // batches mark the stores stale and the settle fires ONCE when
    // the backlog crosses the bound — N takedown batches, one live
    // pass per family. Two takedown waves hit the threshold: exactly
    // one refit, proven by the stores sitting bit-still through the
    // first wave and the exact n landing after the second. Final
    // states must equal fresh fits of the live admitted corpus: HLL
    // on estimates, HH exactly (k ≫ distinct items — the exact
    // regime, so every departure touches tracked items and the
    // deferral clause, not the exact-remove shortcut, is what's
    // exercised), KLL on its exactly-tracked n, the SAMPLE bit-exact
    // (deterministic per-row priorities). The second trigger
    // (refreshCountStores / the maxStale serve faces) and longer
    // backlogs are CountFoldSpec's deferral cases — more gated waves
    // here would re-pay the fixed per-wave cost for coverage the
    // spec already pins. The corpus slice is %16 (was %4 — r12
    // verdict #3's gate-wall trim: q255 already gates the same
    // machinery on %16; the deferral SCHEDULE, not the corpus size,
    // is what this gate certifies, and the three gated waves' fixed
    // cost — not the slice — dominates the wall anyway).
    "q252_fold_deferred_takedown" -> ((s, d) => {
      import s.implicits._
      import graft.streaming.{IndexMaintenance, IngestDedup}
      import graft.operators.{CountStore, HhStore, QuantileStore, SampleStore, SketchStore}
      val idx = "graft_q252_idx"; val sig = "graft_q252_sigs"
      val log = "graft_q252_log"
      val hll = "graft_q252_hll"; val hh = "graft_q252_hh"
      val kll = "graft_q252_kll"; val smp = "graft_q252_smp"
      val (fhll, fhh, fsmp) = ("graft_q252_fhll", "graft_q252_fhh",
        "graft_q252_fsmp")
      IndexMaintenance.initStores(s, idx)
      IngestDedup.initStore(s, sig)
      graft.sources.Sinks.dropTable(s, sig + "_pending_rm")
      for (t <- Seq(log, log + "_applied",
          hll + "_hll", hll + "_hll_params", hll + "_stale",
          hh + "_hh", hh + "_hh_n", hh + "_hh_params", hh + "_stale",
          kll + "_kll", kll + "_kll_params", kll + "_stale",
          smp + "_sample", smp + "_sample_params", smp + "_stale",
          smp + "_stale_ids", smp + "_layout",
          fhll + "_hll", fhll + "_hll_params",
          fhh + "_hh", fhh + "_hh_n", fhh + "_hh_params",
          fsmp + "_sample", fsmp + "_sample_params", fsmp + "_layout"))
        graft.sources.Sinks.dropTable(s, t)
      for (n <- Seq(log, log + "__compact", hll, hh, kll, smp, fhll, fhh,
          fsmp))
        CountStore.setBuilding(s, n, on = false)
      val corpus = Tables.documents(s, d)
        .filter(col("doc_id") % 16 === 0)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .localCheckpoint()
      val hhK = 100000
      val fold = IndexMaintenance.countStoreFold(s,
        sketchStore = Some((hll, "lang")),
        hhStore = Some((hh, "source", hhK)),
        quantileStore = Some((kll, "source", "n_chars")),
        sampleStore = Some((smp, "lang", "n_chars")), sampleK = 5,
        buckets = 8, refitBacklog = 2)
      def applyW(batch: org.apache.spark.sql.DataFrame, ver: Long) =
        IndexMaintenance.applyGatedUpserts(s, idx, sig, batch, ver = ver,
          buckets = 8, docFold = Some((log, fold)))
      def dels(r: Int) = corpus.filter(col("doc_id") % 20 === r)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(null).cast("string").as("lang"),
          lit(null).cast("string").as("source"),
          lit(null).cast("long").as("n_chars"))
      def symEq(x: org.apache.spark.sql.DataFrame,
          y: org.apache.spark.sql.DataFrame) =
        x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty
      // wave 1: the whole (admitted) corpus bootstraps all stores
      applyW(corpus, ver = 1L)
      val hhSnap = s.table(hh + "_hh").localCheckpoint()
      val hllSnap = SketchStore.estimate(s, hll).localCheckpoint()
      val smpSnap = s.table(smp + "_sample").localCheckpoint()
      // waves 2-3: takedown-only batches; 2 must DEFER (stores
      // bit-still, backlog = 1), 3 crosses the threshold
      applyW(dels(4), ver = 2L)
      val deferredT1 = symEq(s.table(hh + "_hh"), hhSnap) &&
        symEq(SketchStore.estimate(s, hll), hllSnap) &&
        symEq(s.table(smp + "_sample"), smpSnap) &&
        CountStore.stalePending(s, hll)._1 == 1 &&
        CountStore.stalePending(s, smp)._1 == 1
      applyW(dels(8), ver = 3L)
      val refitCleared = CountStore.stalePending(s, hll)._1 == 0 &&
        CountStore.stalePending(s, hh)._1 == 0 &&
        CountStore.stalePending(s, kll)._1 == 0 &&
        CountStore.stalePending(s, smp)._1 == 0 &&
        !s.catalog.tableExists(smp + "_stale_ids")
      // final states ≡ fresh fits of the live admitted corpus (the
      // one threshold-triggered re-init settled all three pending
      // waves at once)
      val tomb =
        if (s.catalog.tableExists(idx + "_tombstones"))
          s.table(idx + "_tombstones").select(col("doc_id"))
        else s.range(0).select(col("id").as("doc_id"))
      val liveFinal = corpus.join(
          s.table(idx + "_doclens").select(col("doc_id"))
            .join(tomb, Seq("doc_id"), "left_anti"),
          Seq("doc_id"), "left_semi")
        .localCheckpoint()
      val tokensPerSrc = liveFinal.select(col("source").as("grp"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      val refitNExact = symEq(
        s.table(hh + "_hh_n").select(col("grp"), col("n")), tokensPerSrc)
      SketchStore.initStore(liveFinal, fhll, "lang", "doc_id")
      HhStore.initStore(liveFinal.select(col("source").as("grp"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("item")),
        fhh, "grp", "item", hhK)
      SampleStore.initStore(liveFinal, fsmp, "lang", "doc_id", "n_chars",
        k = 5)
      val hllEq = symEq(SketchStore.estimate(s, hll),
        SketchStore.estimate(s, fhll))
      val hhEq = symEq(s.table(hh + "_hh"), s.table(fhh + "_hh")) &&
        symEq(s.table(hh + "_hh_n"), s.table(fhh + "_hh_n"))
      val kllNEq = symEq(
        s.table(kll + "_kll").select(col("grp"),
          QuantileStore.kllN(col("sk")).as("n")),
        liveFinal.groupBy(col("source").as("grp")).agg(count(lit(1)).as("n")))
      val smpEq = symEq(s.table(smp + "_sample"), s.table(fsmp + "_sample"))
      Seq(
        ("deferred_after_t1", if (deferredT1) 1L else 0L),
        ("final_hh_eq_fresh", if (hhEq) 1L else 0L),
        ("final_hll_eq_fresh", if (hllEq) 1L else 0L),
        ("final_kll_n_exact", if (kllNEq) 1L else 0L),
        ("final_sample_eq_fresh", if (smpEq) 1L else 0L),
        ("n_live", liveFinal.count()),
        ("refit_cleared_at_threshold", if (refitCleared) 1L else 0L),
        ("refit_n_exact_at_threshold", if (refitNExact) 1L else 0L))
        .toDF("component", "val").orderBy(col("component"))
    }),

    // q253: QUANTILE columns in the ANALYZE report (r11 verdict #4) —
    // `kll_sketch_agg` + `kll_quantile` compose into approxProfile's
    // one-pass agg: p50/p95 per NUMERIC column, null for the rest
    // (the min/max discipline applied to percentiles), still no
    // Expand (PlanSpec pins it). The exact legs (n, n_null, min/max,
    // plus the exact-profile n_distinct joined in, the q240 shape)
    // hash-match DuckDB; the served quantiles ride the q248
    // rank-window policy (KLL compaction is randomized): each
    // reported value's realized rank window must intersect
    // [p ± 3ε(200)], and a non-numeric column must serve null —
    // one ok-bit per row.
    "q253_profile_quantiles" -> ((s, d) => {
      import s.implicits._
      val cols = Seq("doc_id", "lang", "n_chars", "source")
      val docs = Tables.documents(s, d).localCheckpoint()
      val eps = graft.functions.KllSketch.normalizedRankError(200)
      val rep = graft.operators.Profile.approxProfile(docs, cols,
        rsd = 0.05, quantiles = Seq(0.5, 0.95)).localCheckpoint()
      val exact = graft.operators.Profile.profile(docs, cols)
        .select(col("col_name"), col("n_distinct"))
      // rank windows for the served quantiles — the report is
      // columns-sized, so the driver-side read is bounded by |cols|
      val served = rep.select("col_name", "p50", "p95").collect()
        .map { r => r.getString(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
            if (r.isNullAt(2)) None else Some(r.getDouble(2)))) }
        .toMap
      // ONE corpus agg for every (column × percentile) lo/hi rank sum
      // (r12 verdict #6: the per-pair loop was 8 driver-side jobs —
      // the q240-family shape the gate-cost discipline exists to kill)
      val probes = cols.flatMap { c =>
        Seq((c, 0.5, served(c)._1), (c, 0.95, served(c)._2))
      }.collect { case (c, p, Some(x)) => (c, p, x) }
      val aggCols = probes.flatMap { case (c, p, x) =>
        val pct = (p * 100).round
        Seq((sum(when(col(c).cast("double") < x, 1).otherwise(0)) /
            count(lit(1))).as(s"lo_${c}_$pct"),
          (sum(when(col(c).cast("double") <= x, 1).otherwise(0)) /
            count(lit(1))).as(s"hi_${c}_$pct"))
      }
      val rankRow =
        if (aggCols.isEmpty) null
        else docs.agg(aggCols.head, aggCols.tail: _*).head()
      def rankOk(c: String, p: Double, v: Option[Double]): Boolean =
        v.forall { _ =>
          val pct = (p * 100).round
          rankRow.getAs[Double](s"lo_${c}_$pct") <= p + 3 * eps &&
            rankRow.getAs[Double](s"hi_${c}_$pct") >= p - 3 * eps
        }
      val bits = cols.map { c =>
        val (v50, v95) = served(c)
        val isNum = docs.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType]
        val ok = (v50.isDefined == isNum) && (v95.isDefined == isNum) &&
          rankOk(c, 0.5, v50) && rankOk(c, 0.95, v95)
        (c, if (ok) 1 else 0)
      }.toDF("col_name", "q_rank_ok")
      rep.join(exact, Seq("col_name")).join(bits, Seq("col_name"))
        .select(col("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"), col("q_rank_ok"))
        .orderBy(col("col_name"))
    }),

    // q254: the 3-D Hilbert WRITER face (r11 verdict #7) —
    // Sinks.parquetHilbert3 lays the events table out along the
    // no-jump curve (ProbeR17X3D: faster to write than zorder3 AND
    // half the blind-spot footprint, so it is the default curve for
    // entity × time × shard); the gate round-trips the layout — write
    // curve-ordered, read back, recompute d from the read rows — and
    // must hash-match q244's generated step-by-step oracle VERBATIM
    // (one truth: the curve; three surfaces: Column face q244, SQL
    // face q243's sibling, writer face here).
    "q254_hilbert3_write" -> ((s, d) => {
      import graft.operators.ZOrder
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q254_hilbert3").getAbsolutePath
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"),
          pmod(col("event_id"), lit(1024L)).as("shard"))
      graft.sources.Sinks.parquetHilbert3(ev, path,
        x = ("user_id", 0L, 99999L),
        y = ("sec", 1704067200L, 1735689599L),
        z = ("shard", 0L, 1023L), bits = 10)
      s.read.parquet(path)
        .select(col("event_id"),
          ZOrder.hilbertIndex3(
            ZOrder.bucket(col("user_id"), 0L, 99999L, 10),
            ZOrder.bucket(col("sec"), 1704067200L, 1735689599L, 10),
            ZOrder.bucket(col("shard"), 0L, 1023L, 10), 10).as("d"))
        .orderBy(col("d"), col("event_id"))
    }),

    // q255: the count-model store layer's BENCH entry (r11 verdict
    // #3) — a lean two-wave fold lifecycle (bootstrap, then a
    // takedown wave that immediately re-inits all three union-only
    // families at refitBacklog = 1, the dominant maintenance cost)
    // sized so min-of-3 benching stays affordable; q252 gates the
    // full deferral schedule. Still ORACLE-GATED: after the refit
    // every served total is an exact function of the live admitted
    // set — HH's n (token counts), KLL's n (doc counts), HLL's group
    // count — so DuckDB mirrors all of them through the admission
    // CTE.
    "q255_store_maintenance" -> ((s, d) => {
      import s.implicits._
      import graft.streaming.{IndexMaintenance, IngestDedup}
      import graft.operators.{CountStore, QuantileStore}
      val idx = "graft_q255_idx"; val sig = "graft_q255_sigs"
      val log = "graft_q255_log"
      val hll = "graft_q255_hll"; val hh = "graft_q255_hh"
      val kll = "graft_q255_kll"
      IndexMaintenance.initStores(s, idx)
      IngestDedup.initStore(s, sig)
      graft.sources.Sinks.dropTable(s, sig + "_pending_rm")
      for (t <- Seq(log, log + "_applied",
          hll + "_hll", hll + "_hll_params", hll + "_stale",
          hh + "_hh", hh + "_hh_n", hh + "_hh_params", hh + "_stale",
          kll + "_kll", kll + "_kll_params", kll + "_stale"))
        graft.sources.Sinks.dropTable(s, t)
      for (n <- Seq(log, log + "__compact", hll, hh, kll))
        CountStore.setBuilding(s, n, on = false)
      val corpus = Tables.documents(s, d)
        .filter(col("doc_id") % 16 === 0)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .localCheckpoint()
      val fold = IndexMaintenance.countStoreFold(s,
        sketchStore = Some((hll, "lang")),
        hhStore = Some((hh, "source", 100000)),
        quantileStore = Some((kll, "source", "n_chars")),
        buckets = 8)
      IndexMaintenance.applyGatedUpserts(s, idx, sig, corpus, ver = 1L,
        buckets = 8, docFold = Some((log, fold)))
      IndexMaintenance.applyGatedUpserts(s, idx, sig,
        corpus.filter(col("doc_id") % 32 === 16)
          .select(col("doc_id"), lit(null).cast("string").as("text"),
            lit(null).cast("string").as("lang"),
            lit(null).cast("string").as("source"),
            lit(null).cast("long").as("n_chars")),
        ver = 2L, buckets = 8, docFold = Some((log, fold)))
      val tomb =
        if (s.catalog.tableExists(idx + "_tombstones"))
          s.table(idx + "_tombstones").select(col("doc_id"))
        else s.range(0).select(col("id").as("doc_id"))
      // four independent store-sized probe actions — run concurrently
      // (r14 optimization, guide §2.6)
      val Seq(nLive, hhItems, kllN, hllGroups) = graft.util.Par.eval(Seq(
        () => s.table(idx + "_doclens").select(col("doc_id"))
          .join(tomb, Seq("doc_id"), "left_anti").count(),
        () => s.table(hh + "_hh_n")
          .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0),
        () => s.table(kll + "_kll")
          .agg(coalesce(sum(QuantileStore.kllN(col("sk"))), lit(0L)))
          .head().getLong(0),
        () => s.table(hll + "_hll").count()))
      Seq(
        ("hh_items_total", hhItems),
        ("hll_groups", hllGroups),
        ("kll_n_total", kllN),
        ("n_live", nLive))
        .toDF("component", "val").orderBy(col("component"))
    }),

    // q256: QUANTILE DRIFT across two standing stores (round 12) —
    // the Drift-surface consumer the KLL store was built to feed:
    // "has this domain's p50/p90 length moved between snapshot A and
    // snapshot B?" served as a groups-sized full-outer join of two
    // standing tables, no corpus read on either side. The exact legs
    // (per-group n on both sides) hash-match DuckDB over the
    // portable-hash split; the served quantiles ride the q248
    // rank-window policy against each side's OWN values (one ok-bit
    // per row covering both sides and both percentiles).
    "q256_quantile_drift" -> ((s, d) => {
      import graft.operators.{CountStore, QuantileStore}
      val a = "graft_q256_a"; val b = "graft_q256_b"
      val k = 200
      val eps = graft.functions.KllSketch.normalizedRankError(k)
      // the split must put every source on BOTH sides: the fixture's
      // source is doc_id-mod-keyed, so a parity-shaped hash would give
      // each source a single side (an empty drift report) — alternate
      // WITHIN each source's id stride instead
      val docs = Tables.documents(s, d)
        .select(col("source").as("grp"),
          col("n_chars").cast("double").as("v"),
          expr("(doc_id div 20) % 2").as("w"))
        .localCheckpoint()
      for (n <- Seq(a, b)) {
        graft.sources.StoreCache.table(s, n, s"klldrift|$n|r12b|$d",
          Seq(n + "_kll", n + "_kll_params")) {
          for (t <- Seq(n + "_kll", n + "_kll_params", n + "_applied"))
            graft.sources.Sinks.dropTable(s, t)
          CountStore.setBuilding(s, n, on = false)
          QuantileStore.initStore(
            docs.filter(col("w") === (if (n == a) 0 else 1)),
            n, "grp", "v", k)
        }
      }
      val served = QuantileStore.drift(s, a, b, Seq(0.5, 0.9))
        .localCheckpoint()
      // rank windows per side: each served percentile must sit inside
      // p ± 3ε of its OWN side's distribution
      def rankBits(suf: String, wVal: Int) = {
        val aggCols: Seq[org.apache.spark.sql.Column] =
          Seq(0.5, 0.9).flatMap { p =>
            val q = col(s"p${(p * 100).round}$suf")
            Seq((sum(when(col("v") < q, 1).otherwise(0)) / count(lit(1)))
                .as(s"lo${(p * 100).round}"),
              (sum(when(col("v") <= q, 1).otherwise(0)) / count(lit(1)))
                .as(s"hi${(p * 100).round}"))
          }
        docs.filter(col("w") === wVal).join(served, Seq("grp"))
          .groupBy(col("grp"))
          .agg(aggCols.head, aggCols.tail: _*)
          .select(col("grp"),
            Seq(0.5, 0.9).map { p =>
              val pct = (p * 100).round
              (col(s"lo$pct") <= p + 3 * eps &&
                col(s"hi$pct") >= p - 3 * eps).cast("int").as(s"ok$pct")
            }.reduce(_ * _).as(s"ok$suf"))
      }
      served
        .join(rankBits("_a", 0), Seq("grp"))
        .join(rankBits("_b", 1), Seq("grp"))
        .select(col("grp"), col("n_a"), col("n_b"),
          (col("ok_a") * col("ok_b")).as("drift_rank_ok"))
        .orderBy(col("grp"))
    }),

    // q257: SERVE-WITH-STALENESS-BOUND (r12 verdict #4) — the
    // deferral made staleness a VISIBLE state a consumer had to know
    // to check; the maxStale serve faces make the guarantee a
    // one-call contract. A deferred takedown wave leaves the HH store
    // stale (backlog 1 < refitBacklog 3); serving through
    // topHitters(maxStale = 0, refresh) auto-refreshes first, and the
    // served rows hash-match a full DuckDB replay of the live corpus
    // (exact MG regime: k ≫ distinct items, so the post-refresh serve
    // is the exact top-10 with a zero envelope). Ungated fold face
    // (applyUpsertsFolded), so the oracle needs no admission CTE —
    // the lifecycle bits (stale before, settled after, store ≡ fresh
    // fit) ride the lifecycle_ok column.
    "q257_serve_max_stale" -> ((s, d) => {
      import org.apache.spark.sql.DataFrame
      import graft.streaming.IndexMaintenance
      import graft.operators.{CountStore, HhStore}
      val idx = "graft_q257_idx"; val log = "graft_q257_log"
      val hh = "graft_q257_hh"; val fhh = "graft_q257_fhh"
      IndexMaintenance.initStores(s, idx)
      for (t <- Seq(log, log + "_applied",
          hh + "_hh", hh + "_hh_n", hh + "_hh_params", hh + "_stale",
          fhh + "_hh", fhh + "_hh_n", fhh + "_hh_params"))
        graft.sources.Sinks.dropTable(s, t)
      for (n <- Seq(log, log + "__compact", hh, fhh))
        CountStore.setBuilding(s, n, on = false)
      val corpus = Tables.documents(s, d)
        .filter(col("doc_id") % 16 === 0)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .localCheckpoint()
      val hhStore = Some((hh, "source", 100000))
      val fold = IndexMaintenance.countStoreFold(s, hhStore = hhStore,
        buckets = 8, refitBacklog = 3)
      def applyW(batch: DataFrame, ver: Long): Unit =
        IndexMaintenance.applyUpsertsFolded(s, idx, batch, ver, log, fold,
          buckets = 8)
      applyW(corpus, 1L)
      applyW(corpus.filter(col("doc_id") % 32 === 16)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(null).cast("string").as("lang"),
          lit(null).cast("string").as("source")), 2L)
      // the takedown wave DEFERRED — the raw store still counts the
      // departed docs; the guaranteed face must settle that first
      val preStale = CountStore.stalePending(s, hh)._1
      val live = corpus.filter(col("doc_id") % 32 =!= 16)
      // the guaranteed serve (refresh → topHitters → settle → backlog
      // re-read) and the fresh-fit CONTROL build touch disjoint stores
      // (hh + log vs fhh) and read independent settled inputs — overlap
      // the two multi-job chains (r14 optimization, guide §2.6)
      val Seq(servedAny, _) = graft.util.Par.eval[Any](Seq(
        () => {
          val sv = HhStore.topHitters(s, hh, n = 10, maxStale = 0,
            refresh = () => IndexMaintenance.refreshCountStores(s, log,
              hhStore = hhStore)).localCheckpoint()
          (sv, CountStore.stalePending(s, hh)._1)
        },
        () => HhStore.initStore(live.select(col("source").as("grp"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("item")),
          fhh, "grp", "item", 100000)))
      val (served, postStale) =
        servedAny.asInstanceOf[(org.apache.spark.sql.DataFrame, Long)]
      def symEq(x: DataFrame, y: DataFrame) =
        x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty
      // the two table-equality probes are independent one-job actions —
      // overlap them (r14, guide §2.6); && over the results is
      // order-insensitive
      val eqBits = graft.util.Par.eval(Seq(
        () => symEq(s.table(hh + "_hh"), s.table(fhh + "_hh")),
        () => symEq(s.table(hh + "_hh_n"), s.table(fhh + "_hh_n"))))
      val ok = preStale == 1 && postStale == 0 && eqBits.forall(identity)
      served.withColumn("lifecycle_ok", lit(if (ok) 1 else 0))
        .orderBy(col("grp"), col("rank"))
    }),

    // q258: FEDERATED store merge (round 13) — the mergeable-summaries
    // property lifted to store⊕store: two disjoint corpus slices ("two
    // crawls on two clusters") are sketched into two standing HH
    // stores; HhStore.mergeStores combines them at the coordinator in
    // groups-sized work with NO corpus read, and the merged serve must
    // hash-match a full DuckDB token-count replay of the UNION slice.
    // Exact regime on both sides AND in the merge (k ≫ union
    // distincts): d_a = d_b = o_merge = 0, so the served envelope is
    // exactly the true counts (cnt_hi = cnt). The compressed-regime
    // contract, parameter-mismatch loudness, and the other three
    // families' merges (HLL / KLL / sample — the sample merge is
    // EXACT by the associative-combiner argument) are
    // StoreFederationSpec's cases.
    "q258_store_federation" -> ((s, d) => {
      import graft.operators.{CountStore, HhStore}
      val (a, b, out) = ("graft_q258_a", "graft_q258_b", "graft_q258_fed")
      def toks(m: Int) = Tables.documents(s, d)
        .filter(col("doc_id") % 32 === m)
        .select(col("source").as("grp"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
      for ((n, m) <- Seq((a, 0), (b, 8))) {
        graft.sources.StoreCache.table(s, n, s"hhfed32|$n|r13|$d",
          Seq(n + "_hh", n + "_hh_n", n + "_hh_params")) {
          for (t <- Seq(n + "_hh", n + "_hh_n", n + "_hh_params",
              n + "_applied"))
            graft.sources.Sinks.dropTable(s, t)
          CountStore.setBuilding(s, n, on = false)
          HhStore.initStore(toks(m), n, "grp", "item", k = 100000)
        }
      }
      for (t <- Seq(out + "_hh", out + "_hh_n", out + "_hh_params"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, out, on = false)
      HhStore.mergeStores(s, a, b, out)
      HhStore.topHitters(s, out, n = 10)
        .orderBy(col("grp"), col("rank"))
    }),

    // q259: NB model FEDERATION (round 14, r13 verdict #4) — the q258
    // discipline reaching the model families: two disjoint corpus
    // slices are fit into two standing NB models on "two clusters";
    // NbStore.mergeStores combines them in model-sized work with NO
    // corpus read, and the merged model's serve surface (top-5 tokens
    // per label + the per-class n_c/t_c mass) must hash-match a full
    // DuckDB token-count replay of the UNION slice. NB counts are
    // plain additive integers, so unlike q258's exact-regime argument
    // this holds with no envelope at all — merged ≡ one-shot fit,
    // bit for bit (StoreFederationSpec proves the score face too).
    "q259_nb_federation" -> ((s, d) => {
      import graft.operators.{CountStore, NbStore}
      val (a, b, out) = ("graft_q259_a", "graft_q259_b", "graft_q259_fed")
      def slice(m: Int) = Tables.documents(s, d)
        .filter(col("doc_id") % 16 === m)
        .select(col("doc_id"), col("text"), col("lang").as("label"))
      for ((n, m) <- Seq((a, 1), (b, 9))) {
        graft.sources.StoreCache.table(s, n, s"nbfed16|$n|r14|$d",
          Seq(n + "_counts", n + "_class")) {
          for (t <- Seq(n + "_counts", n + "_class", n + "_applied"))
            graft.sources.Sinks.dropTable(s, t)
          CountStore.setBuilding(s, n, on = false)
          NbStore.initStore(slice(m), n, buckets = 8)
        }
      }
      for (t <- Seq(out + "_counts", out + "_class"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, out, on = false)
      NbStore.mergeStores(s, a, b, out, buckets = 8)
      graft.plans.TopKPerKey.rankedTopKMulti(
          s.table(out + "_counts").withColumn("__neg", -col("cnt")),
          Seq("label"), Seq("__neg", "token"), 5)
        .drop("__neg")
        .join(s.table(out + "_class"), Seq("label"))
        .select(col("label"), col("rank"), col("token"), col("cnt"),
          col("n_c"), col("t_c"))
        .orderBy(col("label"), col("rank"))
    }),

    // q260: trigram-LM FEDERATION (round 14, r13 verdict #4) — two
    // standing LMs over disjoint slices merge with NO corpus read;
    // the merged model's n-gram surface (top-20 trigrams under a
    // total-order tiebreak, plus all three tables' count masses) must
    // hash-match a full DuckDB n-gram replay of the UNION slice.
    // Additive integer counts: merged ≡ one-shot fit, no envelope.
    "q260_lm_federation" -> ((s, d) => {
      import graft.operators.{CountStore, LmStore}
      val (a, b, out) = ("graft_q260_a", "graft_q260_b", "graft_q260_fed")
      def slice(m: Int) = Tables.documents(s, d)
        .filter(col("doc_id") % 16 === m)
        .select(col("doc_id"), col("text"))
      for ((n, m) <- Seq((a, 3), (b, 11))) {
        graft.sources.StoreCache.table(s, n, s"lmfed16|$n|r14|$d",
          Seq(n + "_tri", n + "_bi", n + "_uni")) {
          for (t <- Seq(n + "_tri", n + "_bi", n + "_uni", n + "_applied"))
            graft.sources.Sinks.dropTable(s, t)
          CountStore.setBuilding(s, n, on = false)
          LmStore.initStore(slice(m), n, buckets = 8)
        }
      }
      for (t <- Seq(out + "_tri", out + "_bi", out + "_uni"))
        graft.sources.Sinks.dropTable(s, t)
      CountStore.setBuilding(s, out, on = false)
      LmStore.mergeStores(s, a, b, out, buckets = 8)
      val totals = s.table(out + "_tri")
        .agg(coalesce(sum(col("c3")), lit(0L)).as("tri_total"))
        .crossJoin(s.table(out + "_bi")
          .agg(coalesce(sum(col("cb")), lit(0L)).as("bi_total")))
        .crossJoin(s.table(out + "_uni")
          .agg(coalesce(sum(col("cu")), lit(0L)).as("uni_total")))
      s.table(out + "_tri")
        .orderBy(col("c3").desc, col("p1"), col("p2"), col("cur"))
        .limit(20)
        .crossJoin(broadcast(totals))
        .select(col("p1"), col("p2"), col("cur"), col("c3"),
          col("tri_total"), col("bi_total"), col("uni_total"))
    }),

    // q261: BM25 index FEDERATION (round 14) — the q259 discipline on
    // the retrieval layer: two disjoint slices indexed as two standing
    // BM25 indexes on "two clusters"; Bm25.mergeIndexes combines them
    // in INDEX-sized work (postings/doclens union as physical facts,
    // df and stats add exactly under the loud doc-disjointness check),
    // and the merged serve must hash-match a full DuckDB BM25 replay
    // of the UNION slice (the q78 arithmetic). Tombstone inheritance,
    // derived-tier rules, and table-level equality to the one-shot
    // union build are Bm25FederationSpec's cases.
    "q261_bm25_federation" -> ((s, d) => {
      val (a, b, out) = ("graft_q261_a", "graft_q261_b", "graft_q261_fed")
      def sl(m: Int) = Tables.documents(s, d)
        .filter(col("doc_id") % 16 === m)
        .select(col("doc_id"), col("text"))
      for ((n, m) <- Seq((a, 5), (b, 13))) {
        graft.sources.StoreCache.table(s, n, s"bm25fed16|$n|r14|$d",
          Seq(n + "_postings", n + "_terms", n + "_doclens", n + "_stats")) {
          graft.operators.Bm25.buildIndex(sl(m), n, buckets = 8)
        }
      }
      graft.operators.Bm25.mergeIndexes(s, a, b, out, buckets = 8)
      val terms = Tables.documents(s, d).filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5))
          .as("term"))
        .distinct().collect().map(_.getString(0)).toSeq
      graft.operators.Bm25.scoreIndexed(s, out, terms)
        .select(col("doc_id"), col("n_matched"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy(col("doc_id"))
    }),

    // q262: HH DRIFT across two standing stores (round 14) — the
    // monitoring consumer the federation layer feeds: "which tokens
    // became heavy between crawl A and crawl B" as a summaries-sized
    // full-outer join (HhStore.drift), no corpus read on either side.
    // Exact regime here (k ≫ distincts, d = 0 both sides), so the MG
    // drift envelope collapses (delta_lo = delta_est = delta_hi) and
    // the whole served report — per-lang top-10 by delta, one-sided
    // items flagged new/vanished — hash-matches a full DuckDB replay
    // of both slices' token counts. The compressed-regime envelope
    // (true delta ∈ [delta_lo, delta_hi]) is HhStoreSpec's case.
    "q262_hh_drift" -> ((s, d) => {
      import graft.operators.{CountStore, HhStore}
      val (a, b) = ("graft_q262_a", "graft_q262_b")
      def toks(m: Int) = Tables.documents(s, d)
        .filter(col("doc_id") % 16 === m)
        .select(col("lang").as("grp"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
      for ((n, m) <- Seq((a, 7), (b, 15))) {
        graft.sources.StoreCache.table(s, n, s"hhdrift16|$n|r14|$d",
          Seq(n + "_hh", n + "_hh_n", n + "_hh_params")) {
          for (t <- Seq(n + "_hh", n + "_hh_n", n + "_hh_params",
              n + "_applied"))
            graft.sources.Sinks.dropTable(s, t)
          CountStore.setBuilding(s, n, on = false)
          HhStore.initStore(toks(m), n, "grp", "item", k = 100000)
        }
      }
      graft.plans.TopKPerKey.rankedTopKMulti(
          HhStore.drift(s, a, b).withColumn("__negd", -col("delta_est")),
          Seq("grp"), Seq("__negd", "item"), 10)
        .drop("__negd")
        .select(col("grp"), col("rank"), col("item"), col("est_a"),
          col("est_b"), col("n_a"), col("n_b"), col("delta_est"),
          col("delta_lo"), col("delta_hi"), col("status"))
        .orderBy(col("grp"), col("rank"))
    }),

    // q263: FEDERATED vector-search serve (round 14) — top-k across
    // two standing IVF shards with INDEPENDENTLY-FIT quantizers
    // (different seeds — the quantizers genuinely differ): queries fan
    // out to each shard's index serve, per-shard top-k lists merge by
    // (dist, id). IVF quantizers are NOT mergeable summaries (two
    // k-means fits share no cell structure), so ANN federates at
    // SERVE time — scatter-gather, |q|·k rows to the coordinator —
    // unlike the count families' store⊕store merges (AnnFederation
    // scaladoc carries the full argument). Exact regime here
    // (nprobe = nlist on both shards): each shard serves its slice's
    // true top-k, the merge is the true union top-k, and the gate
    // rides a full DuckDB distance replay (the q22 arithmetic).
    // Production-nprobe recall carry-over is AnnFederationSpec.
    "q263_ann_federation" -> ((s, d) => {
      import graft.ann.{AnnFederation, IvfIndex}
      val e = Tables.embeddings(s, d)
      def sl(m: Int) = e.filter(col("vec_id") % 16 === m)
      val queries = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val shards = Seq((1, "graft_q263_a", 101L), (9, "graft_q263_b", 202L))
        .map { case (m, t, seed) =>
          val model = IvfIndex(nlist = 8, nprobe = 8, seed = seed).fit(sl(m))
          model.saveStore(sl(m), t, buckets = 8)
          (model, t)
        }
      AnnFederation.knnAcrossIvfStores(s, shards, queries, topK = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // q209: the NSW STANDING-STORE serve (round-10 verdict #3) — the
    // graph lives as a shard-bucketed catalog table and top-k serves
    // straight off it (no fit, no model checkpoint): the IvfIndex
    // knnJoinStore discipline reaching the graph family. Gate bits:
    // table-served ≡ model-served (the store read path must restore
    // whole-shard routing — the round-9 advisory's failure mode), and
    // multi-entry seeding at ef ≥ max shard size changes nothing
    // (exact by the drain-fallback construction, at ANY fixture
    // scale — the ef is computed from the store, not hardcoded).
    "q209_nsw_store_serve" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val model = nsw4(s, d)
      val store = "graft_q209_nsw"
      graft.sources.StoreCache.table(s, store, s"nswstore|12|64|4|42|r10|$d",
        Seq(store, store + "_params")) {
        graft.ann.NswStore.saveStore(model, store)
      }
      val queries = e.filter(col("vec_id") % 11 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      def keyed(df: DataFrame) =
        df.select(col("query_id"), col("rank"), col("neighbor_id"))
      val fromStore = keyed(graft.ann.NswStore.knnJoinStore(s, store,
        queries, topK = 10, ef = 80))
      val fromModel = keyed(model.knnJoin(queries, topK = 10, ef = 80))
      val storeEq = fromStore.exceptAll(fromModel).isEmpty &&
        fromModel.exceptAll(fromStore).isEmpty
      val efEx = graft.ann.NswStore.loadStore(s, store).describe()
        .agg(max(col("nodes"))).head().getLong(0).toInt + 10
      val multi = keyed(graft.ann.NswStore.knnJoinStore(s, store, queries,
        topK = 10, ef = efEx, numEntries = 4))
      val single = keyed(graft.ann.NswStore.knnJoinStore(s, store, queries,
        topK = 10, ef = efEx))
      val multiEq = multi.exceptAll(single).isEmpty &&
        single.exceptAll(multi).isEmpty
      val p = graft.ann.NswStore.loadStore(s, store)
      val paramsOk = p.m == 12 && p.efConstruction == 64 &&
        p.numShards == 4 && p.metric == "euclidean" && p.seed == 42L
      Seq(
        ("multi_entry_eq_at_exhaustive_ef", if (multiEq) 1 else 0),
        ("store_params_roundtrip", if (paramsOk) 1 else 0),
        ("store_serve_eq_model", if (storeEq) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q213: the HIERARCHICAL NSW backend (round-10 verdict #4) under
    // the constant-truth gate — the HNSW layer stack (deterministic
    // hash-assigned levels, greedy layer descent, diversity-heuristic
    // neighbor selection) on the q199 geometry. ProbeNswBig is the
    // scale ledger: on a 50k-node CLUSTERED shard flat NSW strands at
    // recall 0.015 while the hierarchy serves 0.961 at ef=32 with
    // FEWER distance evaluations (51 vs 78 visited/query). Gate bits:
    // recall/MRR floors vs exact (q199's pattern), hierarchical ≡
    // flat at exhaustive ef (both exact by the drain-fallback
    // construction), and the lifecycle invariant (append ≡ fresh fit
    // — levels reproduce from ids, so the hierarchy rebuilds bit-
    // identically).
    "q213_nsw_hier" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val hier = nswh4(s, d)
      val results = hier.knnJoin(queries, topK = 10, ef = 80)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
          col("rank"))
      val truth = graft.operators.KnnExact.knnBatch(e, queries, 10)
        .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
          (lit(11) - col("rank")).cast("double").as("grade"))
      val mtr = graft.operators.RetrievalEval.metrics(results, truth, k = 10)
        .agg(avg(col("recall")).as("r"), avg(col("mrr")).as("m"))
        .head()
      val efEx = hier.describe().agg(max(col("nodes"))).head()
        .getLong(0).toInt + 10
      def served(mm: graft.ann.NswModel) =
        mm.knnJoin(queries, topK = 10, ef = efEx)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
      val eqFlat = served(hier).exceptAll(served(nsw4(s, d))).isEmpty &&
        served(nsw4(s, d)).exceptAll(served(hier)).isEmpty
      val hg = graft.ann.NswGraph(m = 12, efConstruction = 64,
        numShards = 4, seed = 42L, hierarchy = true)
      val maintained = hg.fit(e.filter(col("vec_id") % 4 =!= 0))
        .append(e.filter(col("vec_id") % 4 === 0))
      val fresh = nswh4(s, d)
      val lifeEq = maintained.graph.exceptAll(fresh.graph).isEmpty &&
        fresh.graph.exceptAll(maintained.graph).isEmpty
      Seq(
        ("hier_append_eq_fresh_fit", if (lifeEq) 1 else 0),
        ("hier_eq_flat_at_exhaustive_ef", if (eqFlat) 1 else 0),
        ("mrr_self_exact", if (mtr.getDouble(1) == 1.0) 1 else 0),
        ("recall10_floor_090", if (mtr.getDouble(0) >= 0.90) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q210: the curriculum through the SQL frontend — difficulty via
    // the registered `difficulty_score` scalar (the SAME Column
    // expression the DataFrame path composes), phases via SQL's real
    // ntile/row_number windows, sharing q200's oracle string VERBATIM
    // (one truth, two engine surfaces). The windows are the honest
    // cost of a pure-SQL face; the scale path remains the DataFrame
    // operator's zero-window GlobalOrder form — which q200 proves
    // equal to exactly these windows.
    "q210_sql_curriculum" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.documents(s, d).createOrReplaceTempView("docs_q210")
      s.sql("""
        WITH sc AS (
          SELECT doc_id,
            CAST(size(split(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tok,
            CAST(aggregate(split(trim(lower(text)), '\\s+'), 0L,
                (acc, t) -> acc + length(t)) AS DOUBLE)
              / size(split(trim(lower(text)), '\\s+')) AS mean_wlen,
            CAST(size(array_distinct(split(trim(lower(text)), '\\s+'))) AS DOUBLE)
              / size(split(trim(lower(text)), '\\s+')) AS ttr,
            round(difficulty_score(text), 4) AS difficulty
          FROM docs_q210),
        ph AS (
          SELECT *, ntile(4) OVER (ORDER BY difficulty, doc_id) AS phase
          FROM sc)
        SELECT CAST(phase AS INT) AS phase,
          CAST(row_number() OVER (PARTITION BY phase
            ORDER BY difficulty, doc_id) AS INT) AS rank_in_phase,
          doc_id, n_tok, mean_wlen, ttr, difficulty
        FROM ph ORDER BY phase, rank_in_phase""")
    }),

    // q211: the epoch schedule through the SQL frontend — the
    // registered `epoch_key` scalar (the CRT permutation key, one
    // source of semantics with EpochShuffle) under real per-epoch
    // windows, sharing q202's oracle verbatim.
    "q211_sql_epoch" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.documents(s, d).createOrReplaceTempView("docs_q211")
      s.sql("""
        WITH k AS (
          SELECT epoch, doc_id, epoch_key(doc_id, epoch) AS hk
          FROM docs_q211
          LATERAL VIEW explode(sequence(0, 2)) t AS epoch)
        SELECT CAST(epoch AS INT) AS epoch,
          CAST(row_number() OVER (PARTITION BY epoch
            ORDER BY hk, doc_id) AS BIGINT) AS position,
          doc_id, CAST(hk AS BIGINT) AS hk
        FROM k ORDER BY epoch, position""")
    }),

    // q212: the source-interleaved curriculum through the SQL
    // frontend — difficulty_score + the two nested grouped-rank
    // windows, sharing q207's oracle verbatim.
    "q212_sql_interleave" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.documents(s, d).createOrReplaceTempView("docs_q212")
      s.sql("""
        WITH dsc AS (
          SELECT doc_id, source, round(difficulty_score(text), 4) AS difficulty
          FROM docs_q212),
        ph AS (
          SELECT *, ntile(4) OVER (ORDER BY difficulty, doc_id) AS phase
          FROM dsc),
        st AS (
          SELECT *, row_number() OVER (PARTITION BY phase, source
            ORDER BY difficulty, doc_id) AS src_rank
          FROM ph),
        o AS (
          SELECT *, row_number() OVER (PARTITION BY phase
            ORDER BY src_rank, source) AS read_pos
          FROM st)
        SELECT CAST(phase AS INT) AS phase, CAST(read_pos AS INT) AS read_pos,
          doc_id, source, CAST(src_rank AS INT) AS src_rank, difficulty
        FROM o ORDER BY phase, read_pos""")
    }),

    // q214: trigram STUPID-BACKOFF LM scoring (Brants et al. 2007) —
    // the smoothing web-scale n-gram LMs shipped. Train on the
    // deterministic 90% hash split (the q49 arithmetic), score the
    // 10% holdout: self-training never backs off (every observed
    // trigram is in its own model), so the split is what makes all
    // three tiers fire. tri_frac is the per-doc in-distribution
    // diagnostic (fraction of positions the trigram tier resolved).
    "q214_trigram_backoff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      graft.operators.UnigramLm.trigramStupidBackoff(
          docs.filter(h % 100 >= 90), docs.filter(h % 100 < 90))
        .orderBy(col("doc_id"))
    }),

    // q215: sliding-window chunking — the sequence-prep step between
    // tokenize and pack (max_seq_len pieces with overlap for
    // pretraining; chunk-then-embed for RAG). Narrow projection +
    // explode, zero shuffle; the last chunk always reaches the doc
    // end and no chunk is a strict suffix of its predecessor.
    "q215_chunk_sliding" -> ((s, d) =>
      graft.operators.Chunking.chunk(Tables.documents(s, d),
          window = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // q216: the chunker through the SQL frontend — chunk_texts is the
    // registered face of Chunking.chunkTexts (one source of
    // semantics); shares q215's oracle verbatim.
    "q216_sql_chunk" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.documents(s, d).createOrReplaceTempView("docs_q216")
      s.sql("""
        SELECT doc_id, chunk_id,
          CAST(least(64, n - chunk_id * 48) AS INT) AS n_tokens, chunk
        FROM (
          SELECT doc_id, size(split(lower(trim(text)), '\\s+')) AS n, text
          FROM docs_q216) t
        LATERAL VIEW posexplode(chunk_texts(text, 64, 48)) c
          AS chunk_id, chunk
        ORDER BY doc_id, chunk_id""")
    }),

    // q217: multinomial Naive Bayes domain classifier — train on the
    // 90% hash split (label = source), classify the holdout. The
    // model is closed-form count arithmetic (the smoothed score
    // telescopes to ln prior − n_d·ln(T_c+V) + Σ ln(cnt+1)), so the
    // full fit+serve pipeline hash-matches the oracle — the strongest
    // gate any trained model in the repo can offer. The fixtures'
    // labels carry no textual signal (measured: NB ≈ chance, below
    // the majority class), so this query gates ENGINE PARITY of
    // fit+serve; the learning demonstration (disjoint vocabularies →
    // 20/20) is NbClassifierSpec's separability test.
    "q217_nb_domain" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val train = docs.filter(h % 100 < 90)
        .select(col("doc_id"), col("text"), col("source").as("label"))
      graft.operators.NbClassifier.classify(docs.filter(h % 100 >= 90), train)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("pred"), col("score"))
        .orderBy(col("doc_id"))
    }),

    // q218: the NB model as a STANDING STORE under the driver gate —
    // counts are additive, so the lifecycle (init on the even half,
    // append the odd half, remove a stripe) is algebraically EXACT:
    // the maintained tables must equal a fresh fit of the live set
    // bit-for-bit (integer counts), and store-served scores must
    // equal the in-memory path row-for-row. Equality bits, no recall
    // floors — the q206/q208 pattern for the text-model layer.
    "q218_nb_store_lifecycle" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val labeled = docs.filter(h % 100 < 90)
        .select(col("doc_id"), col("text"), col("source").as("label"))
      val holdout = docs.filter(h % 100 >= 90)
      val name = "graft_q218_nb"
      val fresh = "graft_q218_nb_fresh"
      // 8 buckets: the gate's model tables are tiny — 32-bucket
      // rewrites would be pure file-count overhead in the wall budget
      graft.operators.NbStore.initStore(
        labeled.filter(col("doc_id") % 2 === 0), name, buckets = 8)
      graft.operators.NbStore.appendDocs(
        labeled.filter(col("doc_id") % 2 =!= 0), name, buckets = 8)
      graft.operators.NbStore.removeDocs(
        labeled.filter(col("doc_id") % 7 === 3), name, buckets = 8)
      val live = labeled.filter(col("doc_id") % 7 =!= 3)
      graft.operators.NbStore.initStore(live, fresh, buckets = 8)
      def tableEq(a: String, b: String): Boolean = {
        val x = s.table(a); val y = s.table(b)
        x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
      }
      // settle each side once; the directional diffs then read
      // checkpointed rows instead of recomputing the scoring plans
      val servedStore = graft.operators.NbStore
        .scoreFromStore(s, name, holdout).localCheckpoint()
      val servedFresh = graft.operators.NbClassifier
        .scoreAgainst(holdout, live).localCheckpoint()
      val serveEq = servedStore.exceptAll(servedFresh).isEmpty &&
        servedFresh.exceptAll(servedStore).isEmpty
      val predEq = {
        val a = graft.operators.NbStore.classifyFromStore(s, name, holdout)
          .localCheckpoint()
        val b = graft.operators.NbClassifier.classify(holdout, live)
          .localCheckpoint()
        a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      }
      Seq(
        ("class_eq_fresh_fit", if (tableEq(s"${name}_class", s"${fresh}_class")) 1 else 0),
        ("counts_eq_fresh_fit", if (tableEq(s"${name}_counts", s"${fresh}_counts")) 1 else 0),
        ("pred_eq_in_memory", if (predEq) 1 else 0),
        ("scores_eq_in_memory", if (serveEq) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q219: the trigram LM as a STANDING STORE — q218's additive-count
    // exactness applied to the n-gram tables: init on the even half of
    // the reference, append the odd half, remove a stripe; maintained
    // tri/bi/uni tables must equal a fresh count of the live reference
    // bit-for-bit, and store-served backoff scores must equal the
    // in-memory path row-for-row.
    "q219_lm_store_lifecycle" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val ref = docs.filter(h % 100 < 90).select(col("doc_id"), col("text"))
      val holdout = docs.filter(h % 100 >= 90)
      val name = "graft_q219_lm"
      val fresh = "graft_q219_lm_fresh"
      graft.operators.LmStore.initStore(
        ref.filter(col("doc_id") % 2 === 0), name, buckets = 8)
      graft.operators.LmStore.appendDocs(
        ref.filter(col("doc_id") % 2 =!= 0), name, buckets = 8)
      graft.operators.LmStore.removeDocs(
        ref.filter(col("doc_id") % 7 === 3), name, buckets = 8)
      val live = ref.filter(col("doc_id") % 7 =!= 3)
      graft.operators.LmStore.initStore(live, fresh, buckets = 8)
      def tableEq(a: String, b: String): Boolean = {
        val x = s.table(a); val y = s.table(b)
        x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
      }
      def frameEq(a0: org.apache.spark.sql.DataFrame,
          b0: org.apache.spark.sql.DataFrame): Boolean = {
        // settle each side ONCE: the two directional diffs then read
        // checkpointed rows instead of recomputing the 5-join scoring
        // plan four times
        val a = a0.localCheckpoint(); val b = b0.localCheckpoint()
        a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      }
      val serveEq = frameEq(
        graft.operators.LmStore.scoreFromStore(s, name, holdout),
        graft.operators.UnigramLm.trigramStupidBackoff(holdout, live))
      // one stored model serves ALL THREE LM orders: the bigram and
      // unigram faces read the same tables (context totals derived)
      val biServeEq = frameEq(
        graft.operators.LmStore.bigramScoreFromStore(s, name, holdout),
        graft.operators.UnigramLm.bigramScoreAgainst(holdout, live))
      val uniServeEq = frameEq(
        graft.operators.LmStore.unigramScoreFromStore(s, name, holdout),
        graft.operators.UnigramLm.scoreAgainst(holdout, live))
      Seq(
        ("bi_eq_fresh_count", if (tableEq(s"${name}_bi", s"${fresh}_bi")) 1 else 0),
        ("bigram_serve_eq_in_memory", if (biServeEq) 1 else 0),
        ("scores_eq_in_memory", if (serveEq) 1 else 0),
        ("tri_eq_fresh_count", if (tableEq(s"${name}_tri", s"${fresh}_tri")) 1 else 0),
        ("uni_eq_fresh_count", if (tableEq(s"${name}_uni", s"${fresh}_uni")) 1 else 0),
        ("unigram_serve_eq_in_memory", if (uniServeEq) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q220: STREAMING maintenance of the NB store — waves replayed
    // through the SAME applyBatch body the foreachBatch stream runs
    // (the q160 discipline; the live MemoryStream equivalence is
    // NbStoreSpec's). Bits: stream-fed tables ≡ one-shot fit
    // bit-for-bit (count additivity), a RE-DELIVERED batch id is
    // skipped by the idempotence ledger (at-least-once closed — the
    // one corruption non-negativity cannot see), and the maintained
    // store serves holdout classifications ≡ the in-memory path.
    "q220_nb_stream_maintain" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val labeled = docs.filter(h % 100 < 90)
        .select(col("doc_id"), col("text"), col("source").as("label"))
      val holdout = docs.filter(h % 100 >= 90)
      val name = "graft_q220_nb"
      val fresh = "graft_q220_nb_fresh"
      graft.operators.NbStore.initStore(
        labeled.filter(col("doc_id") % 3 === 0), name, buckets = 8)
      graft.operators.NbStore.applyBatch(
        labeled.filter(col("doc_id") % 3 === 1), name, 8, "text", "label", 1L)
      graft.operators.NbStore.applyBatch(
        labeled.filter(col("doc_id") % 3 === 2), name, 8, "text", "label", 2L)
      val dupSkipped = !graft.operators.NbStore.applyBatch(
        labeled.filter(col("doc_id") % 3 === 1), name, 8, "text", "label", 1L)
      graft.operators.NbStore.initStore(labeled, fresh, buckets = 8)
      def tableEq(a: String, b: String): Boolean = {
        val x = s.table(a); val y = s.table(b)
        x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
      }
      val serveEq = {
        val a = graft.operators.NbStore.classifyFromStore(s, name, holdout)
          .localCheckpoint()
        val b = graft.operators.NbClassifier.classify(holdout, labeled)
          .localCheckpoint()
        a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      }
      Seq(
        ("class_eq_one_shot", if (tableEq(s"${name}_class", s"${fresh}_class")) 1 else 0),
        ("counts_eq_one_shot", if (tableEq(s"${name}_counts", s"${fresh}_counts")) 1 else 0),
        ("dup_delivery_skipped", if (dupSkipped) 1 else 0),
        ("serve_eq_in_memory", if (serveEq) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q221: the DATALOADER END-TO-END — curriculum cut → sliding-
    // window chunking → greedy sequence packing, composed under ONE
    // hash: each stage is individually gated (q200/q215/q91); this
    // query proves the HANDOFFS (schema, ordering keys, group
    // boundaries) compose correctly — the "prepare a training run"
    // pipeline a user actually strings together. Chunks pack within
    // their curriculum phase in (rank_in_phase, chunk_id) order via
    // the composite key rank·1000 + chunk (exact while docs stay
    // under 48k tokens — far beyond any fixture; the bound is the
    // demo's, not the operators'). The oracle replays all three
    // stages: the ntile/rank windows, the window-placement
    // arithmetic, and the greedy fold as a recursive CTE.
    "q221_dataloader_e2e" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pr = graft.operators.Curriculum.phases(docs, numPhases = 4)
        .select(col("doc_id"), col("phase"), col("rank_in_phase"))
      val seq = graft.operators.Chunking.chunk(docs, window = 64, stride = 48)
        .join(pr, "doc_id")
        .select(col("phase").cast("string").as("grp"),
          (col("rank_in_phase").cast("long") * 1000 + col("chunk_id"))
            .as("ord"),
          col("doc_id"), col("chunk_id"),
          col("n_tokens").cast("long").as("tokens"))
      graft.operators.Packing.packGreedy(seq, "ord", "tokens", "grp",
          budget = 256)
        .withColumnRenamed("id", "ord")
        .join(seq.select(col("grp"), col("ord"), col("doc_id"),
          col("chunk_id")), Seq("grp", "ord"))
        .select(col("grp").cast("int").as("phase"), col("doc_id"),
          col("chunk_id"), col("tokens").as("n_tokens"), col("bin"))
        .orderBy(col("phase"), col("doc_id"), col("chunk_id"))
    }),

    // q222: PMI collocation mining (Church & Hanks 1990) — top-50
    // adjacent pairs by pointwise mutual information with a min-count
    // floor; bigram-margin unigram probabilities so every axis
    // marginalizes to 1. Global top-k plans as TakeOrdered; the rank
    // window runs over the 50 survivors only.
    "q222_collocations" -> ((s, d) =>
      graft.operators.TextAnalysis.collocations(
        Tables.documents(s, d), "text", minCount = 5L, topK = 50)),

    // q223: BINNED point-in-interval range join — events inside each
    // same-customer order's 7-day fulfillment window. The naive form
    // has no equi-key (nested loop per customer); binning manufactures
    // one (bin = ⌊epoch_us/w⌋, intervals explode to ≤2 bins at
    // w = span), so the plan is a plain shuffled equi-join + exact
    // containment filter — exact, dedup-free. The oracle is the naive
    // theta join, which must match row for row.
    "q223_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        // NTZ → TIMESTAMP is identity under the session's UTC zone
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("p"))
      val hour = 3600000000L // 1 hour in microseconds
      val iv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("p").as("s0"), (col("p") + hour).as("e0"))
      graft.operators.RangeJoin.pointInInterval(
          ev.select(col("user_id"), col("event_id"), col("p")), iv,
          pointCol = "p", startCol = "s0", endCol = "e0",
          binWidth = hour, equiKeys = Seq("user_id"))
        .select(col("purchase_id"), col("event_id"), col("user_id"))
        .orderBy(col("purchase_id"), col("event_id"))
    }),

    // q224: interval-OVERLAP join — purchase hours × click
    // half-hours, same user. Same binning as q223 plus the
    // canonical-bin trick (keep only the bin containing the overlap
    // start), so each overlapping pair reports exactly once with no
    // distinct pass. Oracle = the naive s₁<e₂ ∧ s₂<e₁ theta join.
    "q224_interval_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("p"))
      val hour = 3600000000L
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("p").as("s1"), (col("p") + hour).as("e1"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("p").as("s2"), (col("p") + hour / 2).as("e2"))
      graft.operators.RangeJoin.intervalOverlap(purch, clicks,
          "s1", "e1", "s2", "e2", binWidth = hour,
          equiKeys = Seq("user_id"))
        .select(col("purchase_id"), col("click_id"), col("user_id"))
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // q225: the NB standing store served from PLAIN SQL — the model
    // is ordinary catalog tables, so a SQL-only user replays the
    // telescoped score with vanilla SQL (no registered functions at
    // all); the gate pins SQL-served ≡ DataFrame-served row-for-row.
    // DuckDB cannot see the catalog, so the oracle is the constant
    // truth the equality bit establishes in-engine.
    "q225_sql_nb_serve" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val labeled = docs.filter(h % 100 < 90)
        .select(col("doc_id"), col("text"), col("source").as("label"))
      val holdout = docs.filter(h % 100 >= 90)
      // deterministic per sf-dir: the GATE reuses the fit across runs
      // (StoreCache is opt-in via graft.store.cache; bench/specs pay
      // real builds). The __building marker stays authoritative — a
      // cached-but-torn store still refuses below.
      graft.sources.StoreCache.table(s, "graft_q225_nb",
        s"nbstore|q225|$d", Seq("graft_q225_nb_counts", "graft_q225_nb_class")) {
        graft.operators.NbStore.initStore(labeled, "graft_q225_nb", buckets = 8)
      }
      holdout.createOrReplaceTempView("holdout_q225")
      val viaSql = s.sql("""
        WITH g AS (SELECT count(DISTINCT token) AS v FROM graft_q225_nb_counts),
          tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n FROM graft_q225_nb_class),
          cls AS (
            SELECT label, ln(CAST(n_c AS DOUBLE) / n) AS logprior,
              ln(CAST(t_c + v AS DOUBLE)) AS logden
            FROM graft_q225_nb_class, g, tot),
          inst AS (
            SELECT doc_id, token FROM holdout_q225
            LATERAL VIEW explode(split(lower(trim(text)), '\\s+')) t AS token),
          hits AS (
            SELECT doc_id, label, sum(ln(cnt + 1)) AS hitsum
            FROM inst JOIN graft_q225_nb_counts USING (token)
            GROUP BY doc_id, label),
          nd AS (
            SELECT doc_id,
              CAST(size(split(lower(trim(text)), '\\s+')) AS BIGINT) AS n_d
            FROM holdout_q225)
        SELECT nd.doc_id, cls.label,
          round(logprior - n_d * logden + coalesce(hitsum, 0.0D), 4) AS score
        FROM nd CROSS JOIN cls
        LEFT JOIN hits ON hits.doc_id = nd.doc_id AND hits.label = cls.label
        """).localCheckpoint()
      val viaDf = graft.operators.NbStore
        .scoreFromStore(s, "graft_q225_nb", holdout).localCheckpoint()
      val eq = viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty
      Seq(("sql_serve_eq_dataframe", if (eq) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q226: the trigram-LM standing store served from PLAIN SQL —
    // q225's discipline on the n-gram tables: stupid backoff as
    // vanilla SQL over _tri/_bi/_uni (two self-joins of _bi play the
    // context and back-off roles), gated SQL ≡ DataFrame row-for-row.
    "q226_sql_lm_serve" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val ref = docs.filter(h % 100 < 90).select(col("doc_id"), col("text"))
      val holdout = docs.filter(h % 100 >= 90)
      graft.sources.StoreCache.table(s, "graft_q226_lm",
        s"lmstore|q226|$d", Seq("graft_q226_lm_tri", "graft_q226_lm_bi",
          "graft_q226_lm_uni")) {
        graft.operators.LmStore.initStore(ref, "graft_q226_lm", buckets = 8)
      }
      holdout.createOrReplaceTempView("holdout_q226")
      val viaSql = s.sql("""
        WITH toks AS (
          SELECT doc_id, split(lower(trim(text)), '\\s+') AS t
          FROM holdout_q226),
        occ AS (
          SELECT doc_id, t[i] AS p1, t[i+1] AS p2, t[i+2] AS cur
          FROM toks
          LATERAL VIEW explode(sequence(0, size(t) - 3)) x AS i
          WHERE size(t) >= 3),
        tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total FROM graft_q226_lm_uni)
        SELECT occ.doc_id, count(1) AS n_trigrams,
          round(avg(CASE WHEN tc.c3 IS NOT NULL THEN 1.0D ELSE 0.0D END), 4)
            AS tri_frac,
          round(avg(ln(
            CASE WHEN tc.c3 IS NOT NULL THEN tc.c3 / b12.cb
                 WHEN b23.cb IS NOT NULL THEN 0.4D * b23.cb / u2.cu
                 ELSE 0.4D * 0.4D * u3.cu / tot.total
            END)), 4) AS logprob_avg
        FROM occ
        LEFT JOIN graft_q226_lm_tri tc
          ON tc.p1 = occ.p1 AND tc.p2 = occ.p2 AND tc.cur = occ.cur
        LEFT JOIN graft_q226_lm_bi b12
          ON b12.prev = occ.p1 AND b12.cur = occ.p2
        LEFT JOIN graft_q226_lm_bi b23
          ON b23.prev = occ.p2 AND b23.cur = occ.cur
        LEFT JOIN graft_q226_lm_uni u2 ON u2.token = occ.p2
        JOIN graft_q226_lm_uni u3 ON u3.token = occ.cur
        CROSS JOIN tot
        GROUP BY occ.doc_id
        """).localCheckpoint()
      val viaDf = graft.operators.LmStore
        .scoreFromStore(s, "graft_q226_lm", holdout).localCheckpoint()
      val eq = viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty
      Seq(("sql_serve_eq_dataframe", if (eq) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q227: the STANDING weighted sample — per-key ES top-k is an
    // associative combiner over per-row deterministic priorities
    // (topk(topk(A) ∪ B) = topk(A ∪ B)), so the store maintained
    // across three waves must equal the batch sample of the whole
    // corpus — and the gate gets a FULL DuckDB oracle (q101's
    // arithmetic over the union), stronger than equality bits.
    "q227_sample_store" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("n_chars"))
      val name = "graft_q227_ws"
      graft.operators.SampleStore.initStore(
        docs.filter(col("doc_id") % 3 === 0), name,
        "lang", "doc_id", "n_chars", k = 5)
      graft.operators.SampleStore.applyBatch(
        docs.filter(col("doc_id") % 3 === 1), name,
        "lang", "doc_id", "n_chars", 1L)
      graft.operators.SampleStore.applyBatch(
        docs.filter(col("doc_id") % 3 === 2), name,
        "lang", "doc_id", "n_chars", 2L)
      graft.operators.SampleStore.sample(s, name)
        .select(col("grp").as("lang"), col("id").as("doc_id"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // q228: the CATALYST RANGE-JOIN REWRITE under the driver gate —
    // plain SQL with NO equi-key (`e.p >= iv.s0 AND e.p < iv.e0`,
    // global intervals), which stock Spark can only plan as a nested
    // loop. With graft's optimizer rule installed and its binWidth
    // conf set, the SAME SQL plans as the binned shuffled equi-join
    // (RangeJoinRewrite.scala) — and DuckDB evaluates the ORIGINAL
    // SQL as the oracle, so the hash match certifies the rewrite is
    // invisible to results. The in-query require pins that the rule
    // actually fired (no CartesianProduct/BNLJ in the physical plan):
    // the gate hashes rows the REWRITTEN plan produced, not a silent
    // fallback. localCheckpoint scopes the conf: the plan is
    // materialized while the conf is set, then the conf is dropped so
    // no other query of the shared session sees the rule armed.
    "q228_sql_range_rule" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("p"))
        .createOrReplaceTempView("graft_q228_events")
      graft.plans.RangeJoinRewrite.install(s)
      s.conf.set(graft.plans.RangeJoinRewrite.BIN_CONF,
        3600000000L.toString) // w = the interval span: ≤ 2 bins each
      try {
        val out = s.sql(
          """SELECT iv.event_id AS purchase_id, e.event_id, e.user_id
             FROM (SELECT event_id, p AS s0, p + 3600000000 AS e0
                   FROM graft_q228_events
                   WHERE event_type = 'purchase' AND event_id % 97 = 0) iv
             JOIN graft_q228_events e
               ON e.p >= iv.s0 AND e.p < iv.e0
             ORDER BY purchase_id, event_id, user_id""")
        val plan = out.queryExecution.sparkPlan.toString
        require(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoop"),
          "range-join rewrite did not fire:\n" + plan)
        out.localCheckpoint()
      } finally s.conf.unset(graft.plans.RangeJoinRewrite.BIN_CONF)
    }),

    // q230: the SAMPLE store served from PLAIN SQL (q225/q226's
    // discipline for the third standing-store family) — and unlike
    // the NB/LM faces, this one gets a FULL DuckDB oracle: the ES
    // priority is engine-portable arithmetic, so DuckDB replays
    // q227's whole-corpus ranking from raw documents while the
    // engine answers from the maintained store via vanilla SQL over
    // the catalog tables (no registered functions). Store ≡ batch ≡
    // cross-engine truth, in one hash.
    "q230_sql_sample_serve" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("n_chars"))
      val name = "graft_q230_ws"
      graft.sources.StoreCache.table(s, name, s"samplestore|q230|$d",
        Seq(s"${name}_sample", s"${name}_sample_params")) {
        graft.operators.SampleStore.initStore(
          docs.filter(col("doc_id") % 3 === 0), name,
          "lang", "doc_id", "n_chars", k = 5)
        graft.operators.SampleStore.applyBatch(
          docs.filter(col("doc_id") % 3 === 1), name,
          "lang", "doc_id", "n_chars", 1L)
        graft.operators.SampleStore.applyBatch(
          docs.filter(col("doc_id") % 3 === 2), name,
          "lang", "doc_id", "n_chars", 2L)
        ()
      }
      graft.operators.CountStore.requireServable(s, name)
      s.sql(
        s"""SELECT grp AS lang, id AS doc_id, rank FROM (
              SELECT grp, id, row_number() OVER (PARTITION BY grp ORDER BY
                round(pow(((((id % 2147483647) * 2654435761) % 2147483647)
                      * 2147483629
                      + ((id % 2147483629) * 2246822519) % 2147483629 + 1)
                    / 4611686018427387904.0, 1.0 / w), 6) DESC, id) AS rank
              FROM ${name}_sample) t
            WHERE rank <= (SELECT max(k) FROM ${name}_sample_params)
            ORDER BY lang, rank""")
    }),

    // q231: the HLL SKETCH store under the driver gate — standing
    // per-group distinct-count sketches maintained across three waves
    // (state ∝ groups, not data; maintenance = register-wise max, no
    // raw-id retention). Hybrid gate, stronger than bits alone: the
    // EXACT per-group distinct counts are computed in-engine and
    // hash-matched against DuckDB's COUNT(DISTINCT), while the two
    // sketch claims ride as ok-bits — ok_rel (estimate within 5% of
    // exact at lgK=12) and ok_near_fresh (maintained store estimate
    // within 1% of the fresh single-pass sketch). NOT exact equality,
    // deliberately: union equivalence holds at the REGISTER level,
    // but DataSketches serves the HIP estimator from a directly-built
    // sketch and only the composite estimator from a merged dense one
    // — so estimate equality is a sparse-mode accident (it held at
    // sf0.01, broke at sf0.1 where groups cross ~1k distincts; the
    // measured gap is ≤0.4% in the crossing band and 0 at scale,
    // ProbeHllDivergence).
    "q231_hll_store" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("event_id"))
      val name = "graft_q231_hll"
      graft.sources.StoreCache.table(s, name, s"hllstore|q231|$d",
        Seq(s"${name}_hll", s"${name}_hll_params")) {
        graft.operators.SketchStore.initStore(
          ev.filter(col("event_id") % 3 === 0), name,
          "event_type", "user_id", lgK = 12)
        graft.operators.SketchStore.applyBatch(
          ev.filter(col("event_id") % 3 === 1), name,
          "event_type", "user_id", 1L)
        graft.operators.SketchStore.applyBatch(
          ev.filter(col("event_id") % 3 === 2), name,
          "event_type", "user_id", 2L)
        ()
      }
      val est = graft.operators.SketchStore.estimate(s, name)
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      val fresh = ev
        .select(col("event_type").cast("string").as("grp"),
          col("user_id").as("id"))
        .groupBy(col("grp"))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("id"), lit(12))).as("fresh_est"))
      est
        .join(exact, est("grp") === exact("event_type"))
        .join(fresh, "grp")
        .select(col("event_type"), col("exact_distinct"),
          (abs(col("n_distinct_est") - col("exact_distinct"))
            / col("exact_distinct") <= 0.05).cast("int").as("ok_rel"),
          (abs(col("n_distinct_est") - col("fresh_est"))
            / col("fresh_est") <= 0.01).cast("int").as("ok_near_fresh"))
        .orderBy(col("event_type"))
    }),

    // q232: the sketch store's PLAIN-SQL serve face — completing the
    // every-standing-store-serves-from-SQL claim (forest q173, BM25
    // q178, NB q225, LM q226, sample q230, sketch here). This face
    // needs ZERO graft-registered functions: `hll_sketch_estimate` is
    // a Spark built-in, so any stock SQL client that can see the
    // catalog serves the store. Gate = the q231 hybrid with the
    // SQL-served estimate on the sketch legs: exact counts
    // cross-engine hashed, ok_rel + ok_sql_eq_df as in-engine bits.
    "q232_sql_sketch_serve" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("event_id"))
      val name = "graft_q231_hll" // q231's store, same cache key
      graft.sources.StoreCache.table(s, name, s"hllstore|q231|$d",
        Seq(s"${name}_hll", s"${name}_hll_params")) {
        graft.operators.SketchStore.initStore(
          ev.filter(col("event_id") % 3 === 0), name,
          "event_type", "user_id", lgK = 12)
        graft.operators.SketchStore.applyBatch(
          ev.filter(col("event_id") % 3 === 1), name,
          "event_type", "user_id", 1L)
        graft.operators.SketchStore.applyBatch(
          ev.filter(col("event_id") % 3 === 2), name,
          "event_type", "user_id", 2L)
        ()
      }
      graft.operators.CountStore.requireServable(s, name)
      val estSql = s.sql(
        s"SELECT grp, hll_sketch_estimate(sk) AS n_sql FROM ${name}_hll")
      val estDf = graft.operators.SketchStore.estimate(s, name)
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      estSql
        .join(estDf, "grp")
        .join(exact, estSql("grp") === exact("event_type"))
        .select(col("event_type"), col("exact_distinct"),
          (abs(col("n_sql") - col("exact_distinct"))
            / col("exact_distinct") <= 0.05).cast("int").as("ok_rel"),
          (col("n_sql") === col("n_distinct_est"))
            .cast("int").as("ok_sql_eq_df"))
        .orderBy(col("event_type"))
    }),

    // q233: the HILBERT curve under the driver gate — same gate shape
    // as q229 (the curve itself, hash-matched cross-engine), for the
    // better-locality layout: unlike Z, consecutive Hilbert positions
    // are Manhattan-adjacent cells (specced as a full-grid bijection
    // + adjacency walk), so a file owning a contiguous d-range has a
    // tighter bounding box. The oracle replays all 16 reflect-rotate
    // rounds as GENERATED materialized CTEs (hilbertOracleSql) — the
    // oracle text is derived from the same recurrence, not hand-typed.
    "q233_hilbert_curve" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"))
        .select(col("event_id"),
          graft.operators.ZOrder.bucket(
            col("user_id"), 0L, 99999L, 16).as("bx"),
          graft.operators.ZOrder.bucket(
            col("sec"), 1704067200L, 1735689599L, 16).as("by"))
      graft.operators.ZOrder.withHilbert(ev, col("bx"), col("by"), 16, "d")
        .select(col("event_id"), col("d"))
        .orderBy(col("d"), col("event_id"))
    }),

    // q234: the data-profiling report (per-column n / nulls / EXACT
    // distincts / min-max) — one corpus pass (multi-countDistinct
    // plans as a single Expand + shuffle, not k scans), pivoted to
    // the tall report by stack over the one aggregated row. Fully
    // hash-matched: counts are integers, min/max surface only for
    // types whose textual form is engine-identical (integrals,
    // byte-ordered strings).
    "q234_profile" -> ((s, d) =>
      graft.operators.Profile.profile(Tables.documents(s, d),
        Seq("doc_id", "lang", "n_chars", "source", "text"))),

    // q240: the NO-EXPAND profiling face (round-10 verdict #7) —
    // approxProfile's plan aggregates all k columns in one pass over
    // UNMULTIPLIED rows (PlanSpec pins the absence of Expand), so
    // profiled-column count stops being a shuffle-volume multiplier:
    // the shape that profiles a 200-column table at 100 TB. Gate: the
    // exact columns (n, n_null, min/max) hash-match the same DuckDB
    // report q234 uses, and the HLL++ estimate is pinned within rsd=5%
    // of the exact distinct per column (ok_rel, a constant-truth bit
    // the oracle mirrors as literal 1 — the q137 discipline).
    "q240_approx_profile" -> ((s, d) => {
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      val docs = Tables.documents(s, d)
      val approx = graft.operators.Profile.approxProfile(docs, cols, rsd = 0.05)
      val exact = graft.operators.Profile.profile(docs, cols)
        .select(col("col_name"), col("n_distinct"))
      approx.join(exact, Seq("col_name"))
        .select(col("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"),
          when(abs(col("n_distinct_est") - col("n_distinct"))
            <= col("n_distinct") * 0.05, 1).otherwise(0).as("ok_rel"))
        .orderBy(col("col_name"))
    }),

    // q235: the 3-D curve (entity × time × shard) — q229's gate shape
    // with the stride-3 dilation; the third dimension here is the
    // event's hash shard, the (id × time × placement) layout a
    // sharded 100 TB event store actually wants. Same declared-range
    // discipline; DuckDB replays the three bucketings and all five
    // stride-3 mask steps.
    "q235_zorder3_curve" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"))
        .select(col("event_id"), graft.operators.ZOrder.zvalue3(
            col("user_id"), 0L, 99999L,
            col("sec"), 1704067200L, 1735689599L,
            pmod(col("event_id"), lit(1024L)), 0L, 1023L,
            bits = 10).as("z"))
        .orderBy(col("z"), col("event_id"))
    }),

    // q241/q242/q243: the LAYOUT-CURVE SQL faces (round-10 verdict
    // #8) — a SQL-only user lays tables out along the Morton/Hilbert
    // curves through registered scalars (`zvalue2`/`zvalue3` re-wrap
    // the ZOrder Column compositions; `hilbert_d` is the native
    // codegen expression — one source of semantics per curve), each
    // hash-gated by SHARING its DataFrame counterpart's oracle
    // verbatim (q229/q235/q233 — one truth, two engine surfaces).
    "q241_sql_zorder" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.events(s, d).createOrReplaceTempView("events_q241")
      s.sql("""
        SELECT event_id,
          zvalue2(user_id, 0, 99999,
            unix_micros(cast(ts as timestamp)) div 1000000,
            1704067200, 1735689599, 16) AS z
        FROM events_q241 ORDER BY z, event_id""")
    }),

    "q242_sql_zorder3" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.events(s, d).createOrReplaceTempView("events_q242")
      s.sql("""
        SELECT event_id,
          zvalue3(user_id, 0, 99999,
            unix_micros(cast(ts as timestamp)) div 1000000,
            1704067200, 1735689599,
            pmod(event_id, 1024), 0, 1023, 10) AS z
        FROM events_q242 ORDER BY z, event_id""")
    }),

    // q243: hilbert_d over SQL-side bucket arithmetic — the bucket's
    // floor(double) ≡ integer `div` equivalence (every product < 2^53)
    // is the same exactness argument the q229 oracle documents.
    "q243_sql_hilbert" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      Tables.events(s, d).createOrReplaceTempView("events_q243")
      s.sql("""
        SELECT event_id,
          hilbert_d(
            (least(greatest(user_id, 0), 99999) * 65536) div 100000,
            ((least(greatest(unix_micros(cast(ts as timestamp)) div 1000000,
              1704067200), 1735689599) - 1704067200) * 65536) div 31622400,
            16) AS d
        FROM events_q243 ORDER BY d, event_id""")
    }),

    // q244: the 3-D HILBERT curve (round-10 verdict #5) — the
    // entity × time × shard layout finally gets the no-jump curve
    // instead of settling for 3-D Morton (q235). Skilling transform
    // (inverse-undo + Gray + stride-3 interleave), gated against a
    // GENERATED DuckDB oracle replaying every step (the q233
    // discipline); HilbertExprSpec pins full-grid bijection +
    // unit-step adjacency, ProbeR17 measures the blind-spot-box win
    // over zvalue3.
    "q244_hilbert3_curve" -> ((s, d) => {
      import graft.operators.ZOrder
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"))
        .select(col("event_id"),
          ZOrder.bucket(col("user_id"), 0L, 99999L, 10).as("bx"),
          ZOrder.bucket(col("sec"), 1704067200L, 1735689599L, 10).as("by"),
          ZOrder.bucket(pmod(col("event_id"), lit(1024L)), 0L, 1023L, 10).as("bz"))
        .select(col("event_id"),
          ZOrder.hilbertIndex3(col("bx"), col("by"), col("bz"), 10).as("d"))
        .orderBy(col("d"), col("event_id"))
    }),

    // q236: the NOT EXISTS range-window EXCLUSION under the driver
    // gate — the decontamination shape ("drop every event inside any
    // flagged purchase's 1-hour window") that Catalyst turns into a
    // LeftAnti join with only range conjuncts: stock Spark can only
    // plan it as a BroadcastNestedLoopJoin; the armed rule turns it
    // into an anti equi-join on bins. Same scoping as q228
    // (localCheckpoint + conf unset), same oracle discipline (DuckDB
    // evaluates the ORIGINAL subquery SQL), and the in-query require
    // pins that no nested loop survived.
    "q236_sql_range_anti" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("p"))
        .createOrReplaceTempView("graft_q236_events")
      graft.plans.RangeJoinRewrite.install(s)
      s.conf.set(graft.plans.RangeJoinRewrite.BIN_CONF,
        3600000000L.toString)
      try {
        val out = s.sql(
          """SELECT e.event_id, e.user_id FROM graft_q236_events e
             WHERE NOT EXISTS (
               SELECT 1 FROM (SELECT p AS s0, p + 3600000000 AS e0
                              FROM graft_q236_events
                              WHERE event_type = 'purchase'
                                AND event_id % 97 = 0) iv
               WHERE e.p >= iv.s0 AND e.p < iv.e0)
             ORDER BY event_id""")
        val plan = out.queryExecution.sparkPlan.toString
        require(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoop"),
          "range anti-join rewrite did not fire:\n" + plan)
        out.localCheckpoint()
      } finally s.conf.unset(graft.plans.RangeJoinRewrite.BIN_CONF)
    }),

    // q229: Z-ORDER layout arithmetic under the driver gate — the
    // Morton curve (clamp → fixed-range bucket → mask-cascade bit
    // spread → interleave) computed over (user_id × event second),
    // hash-matched against DuckDB replaying the identical shifts and
    // masks. This gates the CURVE itself exactly; the layout's read
    // side effect (files a box query must open, z vs linear) is
    // ZOrderSpec's geometry test and ProbeR17's at-scale measurement.
    // Caller-declared ranges (not data quantiles) keep the mapping
    // deterministic and append-stable — the frozen-centroid
    // discipline applied to storage layout.
    "q229_zorder_curve" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"))
        .select(col("event_id"), graft.operators.ZOrder.zvalue2(
            col("user_id"), 0L, 99999L,
            col("sec"), 1704067200L, 1735689599L, bits = 16).as("z"))
        .orderBy(col("z"), col("event_id"))
    }),

    // q206: the NSW LIFECYCLE demonstration under the driver gate
    // (q121/q172's pattern for the graph family): build on a prefix,
    // append the next slice, tombstone a stripe, compact — then
    // assert, as constant-truth ok-bits, the properties the lifecycle
    // scaladoc promises. NSW serve is fully deterministic, so
    // "maintained ≡ fresh fit" is EXACT row equality, not a recall
    // floor.
    "q206_nsw_lifecycle" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") % 13 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val removed = e.filter(col("vec_id") % 9 === 2).select(col("vec_id"))
      val nsw = graft.ann.NswGraph(m = 12, efConstruction = 64,
        numShards = 4, seed = 42L)
      val maintained = nsw
        .fit(e.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding")
        .append(e.filter(col("vec_id") % 3 === 0))
        .remove(removed)
      val compacted = maintained.compact(maxDeadRatio = 0.05)
      // ef = 200 > any shard's node count at the gate fixture → the
      // beam is exhaustive per shard, so BOTH serves return the exact
      // live top-10 and the equality bit is guaranteed by
      // construction, not by recall luck
      def served(mm: graft.ann.NswModel) =
        mm.knnJoin(queries, topK = 10, ef = 200)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
      val fresh = nsw.fit(
        e.join(removed, Seq("vec_id"), "left_anti"), "vec_id", "embedding")
      val liveN = e.count() - removed.count()
      val tombSurfaced = served(maintained)
        .join(removed.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_semi").count()
      val maintainedEqFresh = served(maintained)
        .unionByName(served(fresh)).distinct().count() ==
        served(fresh).count()
      val compactedEqFresh = compacted.graph
        .select(col("shard"), col("node_id"), col("nbrs"))
        .unionByName(fresh.graph
          .select(col("shard"), col("node_id"), col("nbrs")))
        .distinct().count() == fresh.graph.count()
      import s.implicits._
      Seq(
        ("compact_graph_eq_fresh_fit", if (compactedEqFresh) 1 else 0),
        ("compact_purges_to_live_count",
          if (compacted.graph.count() == liveN) 1 else 0),
        ("maintained_serve_eq_fresh", if (maintainedEqFresh) 1 else 0),
        ("tombstones_never_surface", if (tombSurfaced == 0L) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q205: the audio near-dup pipeline through the SQL frontend —
    // the q162/q173/q178/q184/q198 three-surface discipline reaching
    // multimodal: audio_fp from the registry, the 8-band pigeonhole
    // split, bucket join and popcount Hamming all in spark.sql,
    // sharing q204's oracle string VERBATIM (one truth, two engine
    // surfaces). Clip synthesis stays a Scala-built temp view (fixture
    // generators don't belong in the user-facing function registry).
    "q205_sql_audio" -> ((s, d) => {
      GraftSession.registerFunctions(s)
      audioClips(s, d).createOrReplaceTempView("audio_clips")
      s.sql("""
        WITH fp AS (SELECT id, audio_fp(payload) AS fp FROM audio_clips),
        bands AS (
          SELECT id, fp, band,
            shiftrightunsigned(fp, band * 8) & 255 AS bval
          FROM fp LATERAL VIEW explode(sequence(0, 7)) t AS band),
        cand AS (
          SELECT DISTINCT x.id AS id_a, y.id AS id_b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bval = y.bval AND x.id < y.id),
        hm AS (
          SELECT c.id_a, c.id_b, bit_count(a.fp ^ b.fp) AS ham
          FROM cand c
          JOIN fp a ON a.id = c.id_a
          JOIN fp b ON b.id = c.id_b)
        SELECT id_a, id_b, ham FROM hm WHERE ham <= 7
        ORDER BY id_a, id_b""")
    }),

    // q204: perceptual AUDIO near-dup — the modality completing the
    // dedup matrix (text shingles, image dHash, embedding sign codes,
    // now sound): a 64-bit loudness-envelope fingerprint from the
    // REAL PCM decode (integer cross-multiplied mean comparisons, so
    // gain changes don't move the bits), paired by the SAME banded
    // Hamming machinery as q31/q197 (pigeonhole-exact at ham ≤ 7).
    // Fixture: every doc's synthetic WAV plus half-volume copies of
    // every 5th — the perceptual-duplicate case by construction. The
    // oracle replays the sample formula, the halving truncation, the
    // segment bits and the pair Hamming entirely in SQL.
    "q204_audio_neardup" -> ((s, d) => {
      import graft.operators.Multimodal
      // fingerprint ONCE (r14, guide §1.2): simhashPairsBandedFp
      // consumes the fp frame on up to four plan sides (both band-join
      // sides + two verify joins) — left lazy, the PCM decode replayed
      // on each, the exact recompute hazard q140 already pins with its
      // checkpoint ("fingerprint once; decode is the dominant cost")
      val fp = audioClips(s, d).select(col("id"),
        Multimodal.audioFingerprint(col("payload")).as("fp"))
        .localCheckpoint()
      TextDedup.simhashPairsBandedFp(fp, maxHamming = 7)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q203: EXACT edit-distance near-dup pairs (PassJoin segment
    // banding + levenshtein verify) — the character-level near-dup
    // family member, pigeonhole-exact like q197's sign-code banding,
    // so the all-pairs brute oracle must match it ROW FOR ROW. The
    // fixture has no organic typo pairs, so two deterministic typo
    // families are synthesized (the q131/q140/q197 pattern): double
    // substitution (in-place banding) and single deletion (whose tail
    // shift exercises the ±k start slots; prefix-60 ed = deletion +
    // the char pulled across the truncation boundary = 2).
    "q203_edit_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val jitSub = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(substring(col("text"), 1, 2), lit("x"),
            substring(col("text"), 4, 7), lit("q"),
            substring(col("text"), 12, 1000000)).as("text"))
      val jitDel = docs.filter(pmod(col("doc_id"), lit(10)) === 5)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(substring(col("text"), 1, 6),
            substring(col("text"), 8, 1000000)).as("text"))
      graft.operators.TextDedup.editNearDupPairs(
          docs.unionByName(jitSub).unionByName(jitDel),
          "doc_id", "text", maxDist = 2, prefixLen = 60)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q202: the EPOCH SCHEDULE — deterministic resumable data order
    // for a training loop: each epoch is a seeded permutation from
    // pure hash arithmetic on (epoch, id) (the q47 Knuth discipline,
    // so the oracle replays the keys exactly), positions from ONE
    // range-partitioned sort across all epochs (GlobalOrder — no
    // unpartitioned window), within-epoch position arithmetic off the
    // global one. The oracle uses real per-epoch row_number windows,
    // so the gate certifies the arithmetic ≡ window equivalence too.
    "q202_epoch_schedule" -> ((s, d) => {
      graft.operators.EpochShuffle.schedule(
          Tables.documents(s, d), numEpochs = 3)
        .orderBy(col("epoch"), col("position"))
    }),

    // q201: line-level BOILERPLATE removal (the jusText/trafilatura
    // step after q189's HTML strip) under the hash gate: a
    // deterministic page is synthesized around the fixture text (nav
    // menu, search stub, share bar, copyright footer, legal links;
    // content split into pseudo-lines at " and "), then
    // stripBoilerplate must keep exactly the lines the three rules
    // admit — the oracle replays the rules lambda for lambda, so a
    // changed threshold, a tokenization drift, or a separator-rule
    // miss breaks the hash.
    "q201_boilerplate" -> ((s, d) => {
      val page = concat_ws("\n",
        lit("Home | About | Contact | Login"),
        lit("Search"),
        regexp_replace(col("text"), " and ", " and\n"),
        lit("Share on social media"),
        lit("Copyright 2026 Example Corp. All rights reserved."),
        lit("Privacy Policy | Terms of Service"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(page, "\n")).as("total_lines"),
          TextAnalysis.stripBoilerplate(page).as("clean"))
        .withColumn("kept_lines",
          when(length(col("clean")) === 0, lit(0))
            .otherwise(size(split(col("clean"), "\n"))))
        .withColumn("n_chars_clean", length(col("clean")))
        .select(col("doc_id"), col("total_lines"), col("kept_lines"),
          col("n_chars_clean"), col("clean"))
        .orderBy(col("doc_id"))
    }),

    // q197: EMBEDDING near-dup, sub-quadratic — the q31 pigeonhole
    // discipline on sign-bit codes: Hamming(signPack) ≤ 7 means at
    // least one of 8 disjoint bands is IDENTICAL, so the banded
    // equi-join finds every qualifying pair exactly (no recall loss
    // to gate) and only candidate buckets pay a pair join. Reuses the
    // simhash band machinery verbatim on embedding fingerprints. The
    // fixture's random vectors yield no organic ham≤7 pairs, so the
    // corpus unions deterministic sign-jittered copies (flip the
    // first id%5 dims — the q131/q140 synthetic-payload pattern);
    // exact cosine reported per surviving pair.
    "q197_bq_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // the single-word fingerprint (and the 8-band pigeonhole bound)
      // covers 64 dims; a wider corpus needs banding over EVERY
      // signPack word — fail loudly rather than under-count Hamming
      val dim = e.agg(max(size(col("embedding")))).head().getInt(0)
      require(dim <= 64,
        s"q197's single-word sign fingerprint covers <=64 dims, corpus has $dim")
      val kJ = pmod(col("vec_id"), lit(5)).cast("int")
      val jit = e.select((col("vec_id") + 100000L).as("vec_id"),
        concat(
          transform(slice(col("embedding"), lit(1), kJ), x => -x),
          slice(col("embedding"), kJ + 1, size(col("embedding")) - kJ))
          .as("embedding"))
      val u = e.unionByName(jit).localCheckpoint()
      val fp = u.select(col("vec_id").as("id"),
        element_at(graft.functions.VectorFunctions.signPack(col("embedding")), 1)
          .as("fp"))
        .localCheckpoint()
      TextDedup.simhashPairsBandedFp(fp, maxHamming = 7)
        .join(u.select(col("vec_id").as("id_a"), col("embedding").as("__va")), "id_a")
        .join(u.select(col("vec_id").as("id_b"), col("embedding").as("__vb")), "id_b")
        .select(col("id_a"), col("id_b"), col("ham"),
          round(graft.functions.VectorFunctions.cosine(col("__va"), col("__vb")), 4)
            .as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q196: HARD-negative mining (DPR/SimCSE recipe) — for each
    // labeled anchor, the top-5 most-similar DIFFERENT-label vectors
    // plus the margin to its nearest same-label vector. One corpus
    // pass: a single (anchor, same_label)-keyed bounded heap serves
    // both legs. Deterministic → full oracle.
    "q196_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") % 25 === 0)
      graft.operators.Contrastive.hardNegatives(e, anchors, k = 5)
        .orderBy(col("anchor_id"), col("rank"))
    }),

    // q195: RECIPE → SELECTION — the waterfill allocation (q191)
    // driving an actual document draw: within each source, docs are
    // ordered by the portable Knuth hash (the q47/q188 deterministic-
    // shuffle arithmetic) and taken while the running token total
    // stays within the source's allocation. Capped (4-epoch) sources
    // take everything (their repeat demand shows as util 0.25 ≈ 1/4
    // epochs); uncapped sources stop at the water line. The per-source
    // prefix-sum window is the delivery-time exact form — the scale
    // lever is a Bernoulli rate alloc/cap when a source's doc list
    // outgrows one partition's window (same stance as the fplog note).
    "q195_recipe_select" -> ((s, d) => {
      val docs = GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("t"))
        .localCheckpoint()
      val toks = docs.groupBy(col("source")).agg(sum(col("t")).as("toks"))
      val totalToks = toks.agg(sum(col("toks"))).head().getLong(0)
      val domains = toks.select(col("source"),
        (lit(1) + pmod(length(col("source")), lit(3))).as("p"),
        (col("toks") * 4).as("cap"))
      val alloc = graft.operators.MixtureAlloc
        .waterfill(domains, budget = 7L * totalToks / 2, domainCol = "source")
        .select(col("source"), col("alloc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("__ord"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs
        .withColumn("__ord",
          pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)))
        .withColumn("__cum", sum(col("t")).over(w))
        .join(broadcast(alloc), "source")
        .filter(col("__cum") <= col("alloc"))
        .groupBy(col("source"), col("alloc"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sel_tokens"))
        .select(col("source"), col("n_docs"), col("sel_tokens"), col("alloc"),
          round(col("sel_tokens").cast("double") / col("alloc"), 6).as("util"))
        .orderBy(col("source"))
    }),

    // q194: IVF × binary-quant composition gate (the Faiss IVF+binary
    // 100 TB serving shape): coarse cells prune the corpus, 32×
    // asymmetric codes score within probed cells, exact rerank on the
    // bounded candidate set. Constant-truth bits (q130's pattern —
    // seeded kmeans → deterministic recall): recall@10 vs exact
    // euclidean ≥ floor, and at full oversample the composition must
    // EQUAL plain IVF (the candidate cut is the only approximation it
    // adds).
    "q194_ivf_bq_gate" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val model = ivf16x4(s, d)
      def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = pairsOf(graft.operators.KnnExact.knnBatch(e, queries, 10))
      val bq = pairsOf(model.knnJoinBq(e, queries, topK = 10, c = 64))
      val recall = (bq & truth).size.toDouble / truth.size
      val n = e.count().toInt
      val fullC = pairsOf(model.knnJoinBq(e, queries, topK = 10, c = n))
      val plain = pairsOf(model.knnJoin(e, queries, topK = 10))
      val plainRecall = (plain & truth).size.toDouble / truth.size
      import s.implicits._
      Seq(
        // the composition's only OWN approximation is the candidate
        // cut: exact at full oversample, and within 5pp of the plain
        // IVF ceiling at c=64 (measured 0.633 vs 0.635 — the cell
        // pruning dominates the loss, the 32× codes are nearly free)
        ("bq_cut_within_5pp_of_ivf", if (recall >= plainRecall - 0.05) 1 else 0),
        ("full_oversample_equals_ivf", if (fullC == plain) 1 else 0),
        ("recall10_floor_060", if (recall >= 0.60) 1 else 0))
        .toDF("component", "ok").orderBy(col("component"))
    }),

    // q193: ASYMMETRIC binary-quant serving — the full-precision
    // query dotted against sign-reconstructed ±1 documents (Jégou's
    // asymmetric-distance idea on 1-bit codes): same 32× document
    // storage as q190, better candidate recall at the same c
    // (78%→86%@c=50 measured). Deterministic end to end → full
    // oracle, lambda-replayed like q190.
    "q193_bq_asym" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      graft.operators.BinaryQuant.topKRerankAsym(emb, queries, k = 10, c = 50)
        .orderBy(col("query_id"), col("rank"))
    }),

    // q192: MATRYOSHKA dim audit — overlap@10 between prefix-dim
    // (16/32) top-k and full-dim (64) top-k per query: the number
    // that picks a serving dim, computed in ONE corpus pass for all
    // dims (dims explode on the broadcast side). Deterministic (exact
    // cosine + id tiebreaks at every dim) → full oracle.
    "q192_matryoshka_overlap" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      graft.operators.Matryoshka.overlapReport(
          emb, queries, k = 10, dims = Seq(16, 32), fullDim = 64)
        .orderBy(col("dim"), col("query_id"))
    }),

    // q191: MIXTURE WATERFILL — the data-recipe allocation step:
    // per-source token availability (≤4 epochs) + integer priorities
    // (p = 1 + len(source) % 3, a deterministic stand-in for a recipe
    // table) waterfilled against a 3.5×-single-epoch token budget.
    // The capped/uncapped decision is exact integer cross-
    // multiplication over prefix sums (no float water level), so the
    // oracle replays the whole closed form. The single collect is the
    // 1-row budget scalar — model-artifact-sized by the house rule.
    "q191_mixture_waterfill" -> ((s, d) => {
      val toks = GraftSession.widen(Tables.documents(s, d))
        .select(col("source"), TextAnalysis.tokenCount(col("text")).as("t"))
        .groupBy(col("source"))
        .agg(sum(col("t")).cast("long").as("toks"))
        .localCheckpoint()
      val totalToks = toks.agg(sum(col("toks"))).head().getLong(0)
      val domains = toks.select(col("source"),
        (lit(1) + pmod(length(col("source")), lit(3))).as("p"),
        (col("toks") * 4).as("cap"))
      graft.operators.MixtureAlloc
        .waterfill(domains, budget = 7L * totalToks / 2, domainCol = "source")
        .orderBy(col("source"))
    }),

    // q190: BINARY-QUANTIZED serving — sign-bit codes (32×), popcount
    // Hamming scan to top-c candidates, exact-cosine rerank to top-k.
    // Unlike the ANN family this approximate path is fully
    // deterministic (sign bits + integer Hamming + id tiebreaks), so
    // the WHOLE two-stage pipeline hash-matches a DuckDB oracle that
    // recomputes the sign bits with a list lambda — candidate cut
    // included, not just the final ranks.
    "q190_bq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      graft.operators.BinaryQuant.topKRerank(emb, queries, k = 10, c = 50)
        .orderBy(col("query_id"), col("rank"))
    }),

    // q189: HTML → text extraction (the WET step) under the hash
    // gate: deterministic markup is synthesized around the fixture
    // text (inline tags at every " the ", a wrapper div, a script
    // block and entity tail), then stripHtml must recover the clean
    // text — the whole strip is a codegen'd regexp/replace chain the
    // oracle mirrors operation for operation, so a missed block, a
    // tag leak, or an entity double-decode breaks the hash.
    "q189_html_extract" -> ((s, d) => {
      val html = concat(
        lit("""<div class="doc"><!-- c --><p>"""),
        regexp_replace(col("text"), " the ", " <b>the</b> "),
        lit("""</p><script>var x = 1 < 2;</script>""" +
          """<style>p { color: red }</style>&amp;amp; &lt;tail&gt;</div>"""))
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.stripHtml(html).as("clean"))
        .withColumn("n_chars_clean", length(col("clean")))
        .orderBy(col("doc_id"))
    }),

    // q188: SPAN CORRUPTION prep (the T5 denoising objective) over
    // real token ids — span selection is a pure Knuth-hash function of
    // (doc_id, pos), so the corruption is reproducible at any
    // parallelism with no RNG state and the oracle replays it exactly
    // over the q119 generated CTE: total/masked token counts, MERGED
    // span count (the sentinel count a T5 encoder input carries), and
    // a position-weighted checksum of the surviving ids.
    "q188_span_corruption" -> ((s, d) => {
      val ids = GraftSession.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(graft.operators.Bpe.encodeIds(
            col("text"), BpeAssets.merges, BpeAssets.vocabMap)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
      graft.operators.SpanCorruption.summarize(ids)
        .orderBy(col("doc_id"))
    }),

    // q186: tokenizer FERTILITY report — the number that actually
    // picks a tokenizer for a corpus: tokens-per-word (fertility) and
    // squeezed-chars-per-token, per language, for both committed
    // assets side by side. High fertility on a language = that
    // language pays more sequence length for the same text — the
    // standard multilingual-tokenizer audit. One narrow encode pass
    // per form, partial-agg to |langs| rows; exact integer sums
    // divide once at the end (deterministic → 6dp-roundable). The
    // oracle regroups the same generated CTEs q119/q179 are gated by.
    "q186_tokenizer_fertility" -> ((s, d) => {
      // ONE corpus pass: both encodes in one projection, one
      // partial-agg shuffle to |langs| rows, settled tiny before the
      // two form-rows fan out (the DSIR lesson: a per-form leg would
      // scan the corpus once per tokenizer)
      val base = GraftSession.widen(Tables.documents(s, d))
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n_words"),
          length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
            .as("n_sq_chars"),
          size(graft.operators.Bpe.encodeIds(
            col("text"), BpeAssets.merges, BpeAssets.vocabMap))
            .cast("long").as("nb"),
          size(graft.operators.UnigramTokenizer.maxMatchIds(col("text"),
            PieceAssets.costs, PieceAssets.ids, PieceAssets.MaxPieceLen))
            .cast("long").as("nm"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("w"), sum(col("n_sq_chars")).as("c"),
          sum(col("nb")).as("tb"), sum(col("nm")).as("tm"))
        .localCheckpoint()
      def leg(form: String, t: org.apache.spark.sql.Column) = base
        .select(lit(form).as("form"), col("lang"), col("n_docs"),
          round(t / col("w"), 6).as("tokens_per_word"),
          round(col("c") / t, 6).as("chars_per_token"))
      leg("bpe", col("tb")).unionByName(leg("maxmatch", col("tm")))
        .orderBy(col("form"), col("lang"))
    }),

    // q183: deterministic training-shard DELIVERY — the last step of
    // the pipeline: the corpus lands as shard=K directories, one file
    // per shard (fixed shard count is the data-loader contract), shard
    // a pure Knuth-hash function of the id (q47's split arithmetic
    // generalized), and the MANIFEST is computed from the files that
    // actually landed, not from the source frame. The oracle computes
    // the same per-shard counts/chars/id-checksum from the original
    // table, so a lost, duplicated, or misrouted row — or a shard
    // function that drifted — breaks the hash.
    "q183_shard_manifest" -> ((s, d) => {
      val path = "/tmp/graft_q183_shards"
      graft.sources.Sinks.sharded(
        Tables.documents(s, d), path, nShards = 16, idCol = "doc_id")
      graft.sources.Sinks.shardManifest(s, path)
    }),

    // q177: BATCH phrase serving with deletes pending — many phrases
    // (of different lengths) against the standing positional table in
    // one plan: one bucket-pruned positions probe for the term union,
    // broadcast fan-out to (query_id, off) pairs, one (query, doc,
    // start) aggregation checked against each query's own offset
    // count. Phrases are the first 2 tokens of docs 0/1 and the first
    // 3 of doc 2; scoring is over the live (tombstone-adjusted) corpus.
    "q177_phrase_batch" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      graft.operators.Bm25.removeDocs(s, idx,
        docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"))
      val ph = docs.filter(col("doc_id").isin(0, 1, 2))
        .select(col("doc_id").as("query_id"),
          posexplode(slice(TextAnalysis.tokens(col("text")), lit(1),
            when(col("doc_id") === 2, 3).otherwise(2)))
            .as(Seq("off", "term")))
      graft.operators.Bm25.phraseIndexedBatch(s, idx, ph)
        .select(col("query_id"), col("doc_id"), col("phrase_tf"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy(col("query_id"), col("doc_id"))
    }),

    // q176: BATCH tiered serving with deletes pending — the production
    // shape end to end: champion lists were selected at BUILD time
    // (full-corpus weights; the oracle recomputes that selection
    // verbatim), the rescore adjusts to the live corpus, and the
    // per-query top-10 ranks through the TopKPerKeyExec heap on the
    // 4dp grid. A tombstoned champion has no live postings and drops
    // out of the rescore — the "tier survives deletes" contract under
    // the driver's hash gate.
    "q176_champions_batch" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      graft.operators.Bm25.removeDocs(s, idx,
        docs.filter(pmod(col("doc_id"), lit(10)) === 1).select("doc_id"))
      val queries = docs.filter(col("doc_id").isin(0, 2, 4))
        .select(col("doc_id").as("query_id"),
          explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
      graft.operators.Bm25.scoreIndexedTopKBatch(s, idx, queries, 10)
        .select(col("query_id"), col("doc_id"), col("n_matched"),
          round(col("bm25"), 4).as("bm25"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // q122: the N-stage funnel at FOUR stages (signup → view → click →
    // purchase) — exercises the parameterized chain beyond q113's
    // three; same window-free semi-filtered-scan + min-agg plan per
    // stage, fully mirrored by chained CTEs in SQL.
    "q122_funnel_4stage" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      graft.operators.Funnel.funnel(ev,
          Seq("signup", "view", "click", "purchase"))
        .orderBy(col("stage"))
    }),

    // q123: funnel with a CONVERSION WINDOW — each stage must land
    // within 24h of the previous stage's completion (the product-
    // analytics "converted within N days" semantics); same window-free
    // plan, one extra per-row bound on the joined frame.
    "q123_funnel_windowed" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      graft.operators.Funnel.funnel(ev, Seq("view", "click", "purchase"),
          within = Some("INTERVAL 24 HOURS"))
        .orderBy(col("stage"))
    }),

    // q97: interpolated bigram LM quality score (Jelinek-Mercer backoff
    // to the unigram model) — the word-order-sensitive upgrade of q73.
    "q97_bigram_logprob" -> ((s, d) =>
      graft.operators.UnigramLm.bigramScore(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // q99: CCNet-style corpus split — head/middle/tail terciles of the
    // bigram-LM score (Wenzek et al. 2020 bucket by LM perplexity and
    // train preferentially on the head). Thresholds are exact
    // interpolated percentiles computed corpus-wide and broadcast; the
    // per-doc score is q97's (already hash-verified). Tercile literals
    // are the exact doubles 1.0/3 and 2.0/3 print as, mirrored in SQL.
    "q99_ccnet_buckets" -> ((s, d) => {
      val sc = graft.operators.UnigramLm.bigramScore(Tables.documents(s, d))
      // thresholds snap to the scores' own 1e-4 grid: DuckDB's
      // quantile_cont loses an ulp on EQUAL interpolation neighbors
      // ((1-f)·v + f·v ≠ v in fp), Spark's percentile doesn't — round
      // puts both engines on the identical double. Tercile fractions
      // land at .33/.67 of a grid step, never a decimal half, so the
      // HALF_UP/HALF_EVEN divergence can't trigger.
      val thr = sc.agg(
        round(expr("percentile(logprob_avg, 0.3333333333333333)"), 4).as("t33"),
        round(expr("percentile(logprob_avg, 0.6666666666666666)"), 4).as("t67"))
      sc.crossJoin(broadcast(thr))
        .select(col("doc_id"),
          when(col("logprob_avg") < col("t33"), "tail")
            .when(col("logprob_avg") < col("t67"), "middle")
            .otherwise("head").as("bucket"))
        .orderBy(col("doc_id"))
    }),

    // q98: point-in-time-correct feature join — each click event gets
    // the customer's latest order AT event time (no future leakage).
    // Union-tag merge: ONE shuffle, no inequality-join explosion.
    "q98_pit_feature_join" -> ((s, d) => {
      val clicks = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderkey").as("last_orderkey"),
          col("o_totalprice").as("last_totalprice"))
      graft.operators.AsOfJoin.asOf(clicks, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightVals = Seq("last_orderkey", "last_totalprice"),
          rightTieBreak = Seq("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // q102: nearest-in-time join (merge_asof direction='nearest') —
    // each click matched to the time-CLOSEST order of the same
    // customer within a 30-day tolerance, either direction; distance
    // ties prefer the backward match. Same one-shuffle union-tag sort
    // as q98: both direction fills are frames of a single window.
    "q102_nearest_join" -> ((s, d) => {
      val clicks = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderkey").as("near_orderkey"))
      graft.operators.AsOfJoin.asOfNearest(clicks, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightVals = Seq("near_orderkey"),
          rightTieBreak = Seq("near_orderkey"),
          toleranceSec = Some(2592000.0))
        .orderBy(col("event_id"))
    }),

    // Hybrid retrieval, RRF-fused — global ranks WITHOUT a corpus-wide
    // window: heap-pruned top-cand candidates (TakeOrderedAndProject)
    // get exact count-ahead ranks; outsiders provably can't crack the
    // fused top-20 (RankFusion.rrfTopK bound, cand ≥ kRrf + 2k).
    "q79_hybrid_rrf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val terms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
      val bm = graft.operators.Bm25.score(docs, terms)
      val sBm = docs.select(col("doc_id"))
        .join(bm.select(col("doc_id"), col("bm25")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("bm25"), lit(0.0)).as("s"))
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("__qvec"))
      val sCos = e.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          cosine(col("embedding"), col("__qvec")).as("cos"))
      graft.operators.RankFusion.rrfTopK(
        sBm, "s", "rank_bm25", sCos, "cos", "rank_cos",
        idCol = "doc_id", k = 20, kRrf = 60, cand = 200)
    }),

    // q164: the same hybrid legs fused by CONVEX min-max-normalized
    // weighted sum (score-aware, vs q79's rank-only RRF) — each leg
    // normalizes against a broadcast 1-row (min, max), the corpus
    // frames join on the id, and the top-20 heap-prunes. Weight 0.7
    // toward the lexical leg; 1−w computed in doubles on BOTH sides so
    // the oracle's arithmetic is bit-identical.
    "q164_hybrid_linear" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val terms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
      val bm = graft.operators.Bm25.score(docs, terms)
      val sBm = docs.select(col("doc_id"))
        .join(bm.select(col("doc_id"), col("bm25")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("bm25"), lit(0.0)).as("s"))
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("__qvec"))
      val sCos = e.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          cosine(col("embedding"), col("__qvec")).as("cos"))
      graft.operators.RankFusion.linearTopK(
        sBm, "s", sCos, "cos", idCol = "doc_id", k = 20, weightA = 0.7)
    }),

    // Batch BM25 — many queries served in one plan: corpus-side tf/df
    // computed once over the term union, per-query fan-out via a
    // broadcast of the tiny (query_id, term) table. Queries = first 5
    // tokens of docs 0/1/2.
    "q80_bm25_batch" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id").isin(0, 1, 2))
        .select(col("doc_id").as("query_id"),
          explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
      graft.operators.Bm25.scoreBatch(docs, queries)
        .select(col("query_id"), col("doc_id"), col("n_matched"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy(col("query_id"), col("doc_id"))
    }),

    // Streaming near-dup admission: dedup-at-ingest against the
    // standing signature store, replayed in 4 id-ordered micro-batches
    // through the SAME admitBatch the foreachBatch wiring runs.
    // Seen-store semantics make the admitted set batching-independent,
    // so the oracle is exact: a doc is admitted iff it is the later
    // side of NO exact-Jaccard pair (q30's green hash row already
    // proves LSH candidate recall is 1.0 on this fixture/threshold).
    "q87_ingest_dedup" -> ((s, d) => {
      graft.streaming.IngestDedup.replayInBatches(
        Tables.documents(s, d), "graft_q87_seen", nBatches = 4)
        .select(col("id").as("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // q103: the signature store FORGETS — admit the first half, delete
    // doc_id % 10 == 1 from the store, admit the second half. Second-
    // half docs are rejected only by surviving (non-deleted) first-half
    // docs or by their own batch; the deterministic seen-store
    // semantics keep the whole run SQL-expressible (full oracle).
    "q103_signature_delete" -> ((s, d) => {
      val ing = graft.streaming.IngestDedup
      val docs = Tables.documents(s, d)
      ing.initStore(s, "graft_q103_seen")
      val first = ing.admitBatch(
        docs.filter(col("doc_id") < 250), "graft_q103_seen")
      val removed = docs.filter(col("doc_id") < 250 && col("doc_id") % 10 === 1)
        .select(col("doc_id"))
      ing.removeFromStore(s, "graft_q103_seen", removed)
      val second = ing.admitBatch(
        docs.filter(col("doc_id") >= 250), "graft_q103_seen")
      first.unionByName(second)
        .select(col("id").as("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // Quality-aware cluster dedup: connected components over the exact
    // near-dup edges, then keep the highest-quality member per cluster
    // (quality = token count; ties → smallest id) — the curation
    // decision q38 stops short of. Survivors = winners + unclustered.
    "q88_cluster_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.jaccardPairsExact(docs, "doc_id", "text", 3, 0.5)
      val withQ = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("quality"))
      DedupClusters.keepBest(withQ, "doc_id", "quality",
          DedupClusters.components(pairs))
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // Stratified quality floor: keep docs at/above their language's
    // 30th percentile of length — the per-group selection step after
    // quality scoring. Floor = aggregation + broadcast threshold table
    // (never a per-group window: a corpus-scale 'en' partition must
    // not sort in one task). Both engines interpolate (n-1)·p
    // identically in f64, so the thresholds — and the kept set —
    // hash-match.
    "q94_quality_floor" -> ((s, d) => {
      TextAnalysis.percentileFloor(
          Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "n_chars", 0.3)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // SEMANTIC near-dup admission at ingest — the embedding sibling of
    // q87, composing the round's standing-store machinery: batch 1
    // fits the forest, later batches append through frozen planes,
    // cross-batch checks are one zone-map-pruned radius join per
    // batch. Seen-store semantics → batching-independent → exact
    // brute-force cosine oracle (probe: falseAdmit=0, falseReject=0).
    "q93_vec_ingest_dedup" -> ((s, d) => {
      graft.streaming.VectorIngest.replayInBatches(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        nBatches = 4, minCos = 0.4)
        .select(col("id").as("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // Batch serving from the standing inverted index WITH deletes: the
    // postings scan is probed once with the literal term union
    // (bucket-pruned), weights fan out to queries via a broadcast of
    // the (query_id, term) table, and the tombstone adjustments (df,
    // N, avgdl) apply exactly. Oracle = ad-hoc batch BM25 over the
    // SURVIVING documents, so the hash match proves delete-exactness
    // and the shared-work batch fan-out together.
    "q92_bm25_indexed_batch" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = sharedDocsIndex(s, d)
      graft.operators.Bm25.removeDocs(s, idx,
        docs.filter(pmod(col("doc_id"), lit(10)) === 1).select("doc_id"))
      val queries = docs.filter(col("doc_id").isin(0, 2, 4))
        .select(col("doc_id").as("query_id"),
          explode(slice(TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
      graft.operators.Bm25.scoreIndexedBatch(s, idx, queries)
        .select(col("query_id"), col("doc_id"), col("n_matched"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy(col("query_id"), col("doc_id"))
    }),

    // Greedy sequence packing per source group: docs in id order fill
    // token-budget bins (the pretraining batch-prep step). Packing is
    // sequential WITHIN a group by nature, so groups are the parallel
    // unit (the sessionization shape); the oracle replays the same
    // greedy fold as a shallow recursive CTE (depth = max docs/group).
    "q91_sequence_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("tokens"))
      graft.operators.Packing.packGreedy(docs, "doc_id", "tokens", "source",
          budget = 256)
        .select(col("grp"), col("id").as("doc_id"), col("tokens"), col("bin"))
        .orderBy(col("grp"), col("doc_id"))
    }),

    // REAL-codec roundtrip under the hash gate: deterministic images
    // are encoded as actual PNGs (javax.imageio) and decoded back by
    // the production decode path; the output is exact integer channel
    // sums, so the oracle reproduces them from the pixel formula alone
    // — a codec-free engine hash-matching a real encode→decode proves
    // the codec is lossless-correct, not stubbed.
    "q90_codec_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      GraftSession.widen(docs)
        .withColumn("payload", Multimodal.syntheticPng(col("doc_id")))
        .select(col("doc_id"), Multimodal.imageChannelSums(col("payload")).as("st"))
        .select(col("doc_id"),
          col("st._1").as("width"), col("st._2").as("height"),
          col("st._3").as("sum_r"), col("st._4").as("sum_g"), col("st._5").as("sum_b"))
        .orderBy(col("doc_id"))
    }),

    // q120: REAL audio decode under the hash gate — the WAV analog of
    // q90: deterministic PCM16 clips are encoded as actual WAV files
    // (javax.sound.sampled) and decoded back by the production
    // wavStats path; every output lane is an exact integer (peak /
    // Σ|s| / Σs² per channel, truncated duration), so the oracle
    // reproduces them from the sample formula alone. Upgrades audio
    // from byte-stats stub to a real codec path.
    "q120_wav_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      GraftSession.widen(docs)
        .withColumn("payload", Multimodal.syntheticWav(col("doc_id")))
        .select(col("doc_id").as("media_id"),
          Multimodal.wavStats(col("payload")).as("st"))
        .select(col("media_id"), col("st.*"))
        .orderBy(col("media_id"))
    }),

    // q161: ALL THREE pure-JDK audio containers under one hash gate —
    // the same PCM16 clip encoded as WAV (little-endian), AIFF and AU
    // (big-endian) and decoded back by the one endian-aware audioStats
    // path. Lossless PCM containers must yield bit-identical integer
    // lanes per id regardless of container; the oracle replays the
    // sample formula once and fans it across the three format labels.
    // Shrinks the multimodal stub boundary to compressed/container
    // formats the JDK has no codec for (MP3/MP4 — a permanent
    // boundary without native deps).
    "q161_audio_formats" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      GraftSession.widen(docs)
        .withColumn("format", explode(array(lit("wav"), lit("aiff"), lit("au"))))
        .withColumn("payload",
          Multimodal.syntheticAudio(col("doc_id"), col("format")))
        .select(col("doc_id").as("media_id"), col("format"),
          Multimodal.audioStats(col("payload")).as("st"))
        .select(col("media_id"), col("format"), col("st.*"))
        .orderBy(col("media_id"), col("format"))
    }),

    // q106: MMR diversified re-ranking — the standard serving layer
    // after ANN retrieval. Corpus-sized work is heap-pruned candidate
    // generation; the greedy pick runs over the bounded candidate set.
    // Deterministic (ties on id), so the unrolled 5-step greedy is a
    // full DuckDB oracle.
    "q106_mmr_rerank" -> ((s, d) => {
      graft.operators.Mmr.rerank(Tables.embeddings(s, d),
          queryId = 0L, k = 5, lambda = 0.7, cand = 50)
        .orderBy(col("rank"))
    }),

    // q108: batch MMR — three query bags diversified in ONE plan
    // (corpus pass shared; per-query candidate heaps via TopKPerKey),
    // greedy over the bounded |queries|*cand candidate slice. The
    // per-query greedy unrolls to windowed SQL steps -> full oracle.
    "q108_mmr_batch" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.operators.Mmr.rerankBatch(e, queries, k = 3, lambda = 0.7, cand = 20)
        .orderBy(col("qid"), col("rank"))
    }),

    // q109: embedding-space drift per source — centroid cosine to the
    // global centroid, computed entirely as (source, dim)-keyed
    // aggregations over the posexploded join (no arrays collected, no
    // window; the "centroid" never materializes as a vector).
    "q109_embedding_drift" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val j = docs.join(e, col("doc_id") === col("vec_id"))
        .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "x")))
      val ps = j.groupBy(col("source"), col("dim"))
        .agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
      val g = j.groupBy(col("dim")).agg(avg(col("x")).as("gm"))
      val gg = g.agg(sum(col("gm") * col("gm")).as("gg"))
      ps.join(g, "dim")
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_vecs"),
          sum(col("m") * col("gm")).as("__dot"),
          sum(col("m") * col("m")).as("__nn"))
        .crossJoin(broadcast(gg))
        .select(col("source"), col("n_vecs"),
          round(col("__dot") / (sqrt(col("__nn")) * sqrt(col("gg"))), 6)
            .as("cos_to_global"))
        .orderBy(col("source"))
    }),

    // q107: per-source token-distribution drift vs the corpus mix
    // (plug-in KL on the slice support — no smoothing constant, exactly
    // SQL-expressible). Two token-keyed hash aggs, no window.
    "q107_source_drift" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      graft.operators.Drift.klBySlice(GraftSession.widen(toks), "source", "tok")
        .orderBy(col("source"))
    })
  )

  /** Headline subset timed by Bench (covers scan/agg/join/window/ANN/
    * dedup/text/streaming without the O(n²) oracle-only pair queries).
    * Kept verbatim since round 1 for cross-round comparability — new
    * coverage goes in [[benchCurationQueries]], never here. */
  val benchQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q02_filter_project", "q04_order_revenue",
    "q05_window_top3", "q06_topk_orders", "q10_monthly_revenue",
    "q16_asof_prior_purchase", "q21_knn_exact_point", "q22_knn_exact_batch",
    "q23_dedup_embeddings", "q26_ann_knn_join", "q30_minhash_pairs",
    "q35_ann_bucketed_join", "q37_ivf_join",
    "q40_text_stats", "q41_quality_lang", "q50_events_hourly",
    "q52_sessionize")

  /** Second bench group (round 8): the LLM-curation engine that now
    * dominates the repo gets tracked round-over-round numbers of its
    * own — a regression in TextDedup/Bm25/TextAnalysis was previously
    * invisible to the bench artifact (its timings lived only in
    * ARCHITECTURE.md prose). Reported as a separate total so the
    * original 18-query headline stays comparable across rounds. */
  val benchCurationQueries: Seq[String] = Seq(
    "q139_bloom_decontaminate", "q140_phash_neardup", "q141_nb_classifier",
    "q146_incremental_index", "q151_pipeline_funnel", "q158_dedup_dashboard")

  /** Third bench group (round 9): the asset/delivery layer —
    * committed-tokenizer encode throughput (MaxMatch + the BPE-based
    * fertility pass), HTML extraction, span-corruption prep, and
    * shard delivery+manifest. Separate total, same rationale as the
    * curation group: keep the older groups comparable across rounds
    * while the new layer gets regression-visible numbers. */
  val benchAssetQueries: Seq[String] = Seq(
    "q179_maxmatch_ids", "q183_shard_manifest", "q186_tokenizer_fertility",
    "q188_span_corruption", "q189_html_extract")

  /** Fourth bench group (round 9): the compression-serving + mining
    * layer — both binary-quant passes, the matryoshka audit, hard
    * negatives, and the banded embedding near-dup. First recorded the
    * round it was born, so every later round sees its regressions. */
  val benchServingQueries: Seq[String] = Seq(
    "q190_bq_rerank", "q192_matryoshka_overlap", "q193_bq_asym",
    "q196_hard_negatives", "q197_bq_neardup",
    // round-9 wave 3, tracked from birth: the one-sort curriculum cut,
    // the line-rule boilerplate strip, and the audio near-dup miner.
    // q199 (NSW build) and q203 (PassJoin, ~15s at sf0.1) are
    // fit/mining-time costs, not serving paths — their scale numbers
    // live in ARCHITECTURE's probe tables (ProbeNsw, ProbeEditDedup)
    // instead of inflating the min-of-3 sweep.
    "q200_curriculum", "q201_boilerplate", "q204_audio_neardup")

  /** Fifth bench group (round 10): the text-model layer — trigram
    * stupid-backoff LM scoring, sliding-window chunking, and the
    * multiclass NB fit+serve pipeline. Tracked from birth, same
    * rationale as every prior group: older totals stay comparable
    * across rounds, the new layer's regressions are artifact-visible
    * from the round it appeared. */
  val benchModelQueries: Seq[String] = Seq(
    "q214_trigram_backoff", "q215_chunk_sliding", "q217_nb_domain",
    // the dataloader end-to-end composite, tracked from ITS birth
    // round too — a regression in any stage handoff shows here even
    // if the per-stage entries stay flat
    "q221_dataloader_e2e")

  /** Sixth bench group (round 10): the layout curves and the SQL
    * range-join rewrite — pure-compute entries (curve arithmetic +
    * the rewritten join), regression-visible from their birth round.
    * Store-lifecycle queries (q231/q232) stay out: bench pays real
    * builds by design, and the lifecycle cost story lives with the
    * other store families in the curation group's q146 class. */
  val benchLayoutQueries: Seq[String] = Seq(
    "q229_zorder_curve", "q233_hilbert_curve", "q228_sql_range_rule",
    "q236_sql_range_anti",
    // round 11: the 3-D Hilbert curve, tracked from ITS birth round
    // (pure compute — the Skilling kernel inside whole-stage codegen)
    "q244_hilbert3_curve",
    // round 12: the 3-D Hilbert WRITER face — the write-path cost of
    // the default entity×time×shard layout, tracked from its birth
    "q254_hilbert3_write")

  /** Seventh bench group (round 12, r11 verdict #3): the COUNT-MODEL
    * STORE layer's SERVE costs — the Misra-Gries heavy-hitters serve
    * (q247 shape) and the KLL quantile SQL serve (q249 shape).
    * Round 14 (r13 verdict #6): the build-dominated lifecycle entries
    * that used to sit here moved to [[benchLifecycleQueries]] so this
    * group reads as what serving costs, not what building costs —
    * q255 + q257 were 26 s of a ~46 s bench and min-of-3 multiplied
    * them into the serve story. */
  val benchStoreQueries: Seq[String] = Seq(
    "q247_hh_serve", "q249_sql_quantile_serve")

  /** Eighth bench group (round 14, r13 verdict #6): store LIFECYCLE
    * costs — real builds by design (bootstrap + takedown + refresh
    * schedules), reported as their own total so the query-serving
    * groups stay readable while the maintenance story keeps its
    * round-over-round regression tracking. q255/q257 keep their full
    * histories (tracked from rounds 12/13 in the stores group).
    * q260-q263 stay out with the q199/q203 rationale: their walls are
    * side-FIT-dominated (LM = the q259 algebra across three tables;
    * BM25/drift/ANN likewise pay two builds to exercise one
    * model-sized merge or summaries-sized join), so benching them
    * would triple this group while measuring the same build class
    * q259 already tracks; ProbeFederation carries the measured
    * merge-vs-refit separation instead. */
  val benchLifecycleQueries: Seq[String] = Seq(
    "q255_store_maintenance", "q257_serve_max_stale",
    // round 14: NB model federation — two fits + the coordinator
    // merge, tracked from its birth round
    "q259_nb_federation")

  /** q204's oracle, shared verbatim by q205 (the SQL-frontend face of
    * the same audio near-dup pipeline): one truth, two engine-side
    * surfaces — the q193/q198 discipline for multimodal. */
  private val audioNearDupOracleSql: String =
    """WITH clips AS (
         SELECT doc_id AS id, doc_id AS base, FALSE AS hv FROM documents
         UNION ALL
         SELECT doc_id + 100000, doc_id, TRUE FROM documents
         WHERE doc_id % 5 = 0),
       b AS (
         -- least(·, 1e7) mirrors audioFingerprint's ENFORCED excerpt
         -- bound (FpMaxFrames): identity at the fixture's <=96 frames,
         -- definitional for podcast-length clips
         SELECT id, base, hv, 1 + base % 2 AS channels,
           least(64 + base % 33, 10000000) AS n
         FROM clips),
       samp AS (
         SELECT id, n, i,
           CASE WHEN hv THEN CAST(trunc(s0 / 2.0) AS BIGINT) ELSE s0 END AS s
         FROM (
           SELECT id, hv, n, i,
             ((base * 31 + (i * channels) * 7919) % 65536) - 32768 AS s0
           FROM (SELECT id, base, hv, channels, n,
                   unnest(range(n)) AS i FROM b))),
       seg AS (
         SELECT id, n, (i * 64) // n AS k,
           CAST(sum(abs(s)) AS BIGINT) AS sa, CAST(count(*) AS BIGINT) AS cnt
         FROM samp GROUP BY id, n, (i * 64) // n),
       tot AS (SELECT id, n, CAST(sum(sa) AS BIGINT) AS ta
               FROM seg GROUP BY id, n),
       bits AS (
         SELECT t.id, g.k AS k,
           COALESCE(s.sa * t.n > t.ta * s.cnt, FALSE) AS bit
         FROM tot t CROSS JOIN (SELECT unnest(range(64)) AS k) g
         LEFT JOIN seg s ON s.id = t.id AND s.k = g.k),
       hm AS (
         SELECT a.id AS id_a, b2.id AS id_b,
           CAST(sum(CASE WHEN a.bit <> b2.bit THEN 1 ELSE 0 END) AS INT)
             AS ham
         FROM bits a JOIN bits b2 ON a.k = b2.k AND a.id < b2.id
         GROUP BY a.id, b2.id)
       SELECT id_a, id_b, ham FROM hm WHERE ham <= 7
       ORDER BY id_a, id_b"""

  /** q200's oracle, shared verbatim by q210 (the SQL-frontend face of
    * the same curriculum): the lexical difficulty score with the
    * 4dp-rounded sort key, DuckDB's real ntile window against the
    * engine's arithmetic phase cut. */
  private val curriculumOracleSql: String =
    """WITH toks AS (
         SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
         FROM documents),
       sc AS (
         SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
           CAST(length(array_to_string(t, '')) AS DOUBLE) / len(t) AS mean_wlen,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
         FROM toks),
       d AS (
         SELECT doc_id, n_tok, mean_wlen, ttr,
           round(0.5 * mean_wlen + 3.0 * (1.0 - ttr) + ln(1.0 + n_tok), 4)
             AS difficulty
         FROM sc),
       ph AS (
         SELECT *, ntile(4) OVER (ORDER BY difficulty, doc_id) AS phase
         FROM d)
       SELECT CAST(phase AS INT) AS phase,
         CAST(row_number() OVER (PARTITION BY phase
           ORDER BY difficulty, doc_id) AS INT) AS rank_in_phase,
         doc_id, n_tok, mean_wlen, ttr, difficulty
       FROM ph ORDER BY phase, rank_in_phase"""

  /** q202's oracle, shared verbatim by q211: the CRT-paired
    * multiplicative permutation keys (every product < 2^63 — exact
    * BIGINT in both engines), real per-epoch row_number windows
    * against the engine's one-sort arithmetic positions. */
  private val epochScheduleOracleSql: String =
    """WITH e AS (SELECT unnest(range(3)) AS epoch),
       k AS (
         SELECT epoch, doc_id,
           ((doc_id + 131071 * epoch) % 2147483647 * 2654435761
              % 2147483647) * 2147483629
             + (doc_id + 524287 * epoch) % 2147483629 * 2246822519
               % 2147483629 AS hk
         FROM documents CROSS JOIN e)
       SELECT CAST(epoch AS INT) AS epoch,
         CAST(row_number() OVER (PARTITION BY epoch
           ORDER BY hk, doc_id) AS BIGINT) AS position,
         doc_id, CAST(hk AS BIGINT) AS hk
       FROM k ORDER BY epoch, position"""

  /** q207's oracle, shared verbatim by q212: q200's difficulty and
    * ntile phase, then the two nested grouped ranks as REAL windows
    * against the engine's exact-offset form. */
  /** q215's oracle, shared verbatim by q216 (the SQL-frontend face of
    * the same chunker): one truth, two engine-side surfaces. */
  private val chunkOracleSql: String =
    """WITH t AS (
         SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
         FROM documents),
       c AS (
         SELECT doc_id, toks, len(toks) AS n,
           CASE WHEN len(toks) <= 64 THEN 1
                ELSE 1 + CAST(ceil((len(toks) - 64) / 48.0) AS INT)
           END AS nc
         FROM t),
       e AS (SELECT doc_id, toks, n, unnest(range(nc)) AS k FROM c)
       SELECT doc_id, CAST(k AS INT) AS chunk_id,
         CAST(least(64, n - k * 48) AS INT) AS n_tokens,
         array_to_string(toks[k*48+1 : k*48+64], ' ') AS chunk
       FROM e ORDER BY doc_id, chunk_id"""

  private val interleaveOracleSql: String =
    """WITH toks AS (
         SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
         FROM documents),
       sc AS (
         SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
           CAST(length(array_to_string(t, '')) AS DOUBLE) / len(t) AS mean_wlen,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
         FROM toks),
       d AS (
         SELECT doc_id,
           round(0.5 * mean_wlen + 3.0 * (1.0 - ttr) + ln(1.0 + n_tok), 4)
             AS difficulty
         FROM sc),
       ph AS (
         SELECT d.*, ntile(4) OVER (ORDER BY difficulty, doc_id) AS phase
         FROM d),
       j AS (
         SELECT ph.*, doc.source
         FROM ph JOIN documents doc USING (doc_id)),
       s AS (
         SELECT *, row_number() OVER (PARTITION BY phase, source
           ORDER BY difficulty, doc_id) AS src_rank
         FROM j),
       o AS (
         SELECT *, row_number() OVER (PARTITION BY phase
           ORDER BY src_rank, source) AS read_pos
         FROM s)
       SELECT CAST(phase AS INT) AS phase, CAST(read_pos AS INT) AS read_pos,
         doc_id, source, CAST(src_rank AS INT) AS src_rank, difficulty
       FROM o ORDER BY phase, read_pos"""

  /** q193's oracle, shared verbatim by q198 (the SQL-frontend face of
    * the same pipeline): one truth, two engine-side surfaces. */
  private val bqAsymOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
       p AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(e.v) + 1),
             i -> q.qv[i] * (CASE WHEN e.v[i] < 0 THEN -1 ELSE 1 END))) AS asym,
           list_cosine_similarity(e.v, q.qv) AS c
         FROM e CROSS JOIN q),
       cand AS (
         SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY asym DESC, neighbor_id) AS ark
         FROM p),
       rer AS (
         SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id
             ORDER BY c DESC, neighbor_id) AS rank
         FROM cand WHERE ark <= 50)
       SELECT query_id, rank, neighbor_id, round(c, 4) AS cos
       FROM rer WHERE rank <= 10 ORDER BY query_id, rank"""

  /** TPC-H Q3 shape in dialect-neutral SQL — executed verbatim by BOTH
    * Spark (q54 query) and DuckDB (q54 oracle). */
  private val sharedSqlQ3: String =
    """SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1995-03-15'
         AND l_shipdate > TIMESTAMP '1995-03-15'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""

  /** GROUPING SETS with grouping() markers — dialect-neutral, executed
    * verbatim by BOTH Spark (q45) and DuckDB (oracle). grouping() is
    * TINYINT in Spark vs BIGINT in DuckDB, so both sides cast to INT. */
  private val sharedSqlGroupingSets: String =
    """SELECT n_name, c_mktsegment,
       CAST(grouping(n_name) AS INTEGER) AS g_nation,
       CAST(grouping(c_mktsegment) AS INTEGER) AS g_seg,
       count(*) AS n_rows
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment))
       ORDER BY g_nation, g_seg, n_name NULLS FIRST, c_mktsegment NULLS FIRST"""

  /** Correlated LATERAL subquery — dialect-neutral, executed verbatim
    * by BOTH Spark (q46) and DuckDB (oracle). The IS NOT NULL filter
    * pins the engines to the same result on orders with no lineitems
    * (Spark keeps them with NULL, DuckDB's decorrelation drops them). */
  private val sharedSqlLateral: String =
    """SELECT o_orderkey, o_totalprice, t.max_price
       FROM orders, LATERAL (
         SELECT max(l_extendedprice) AS max_price
         FROM lineitem WHERE l_orderkey = o_orderkey) t
       WHERE t.max_price IS NOT NULL
       ORDER BY o_orderkey"""

  /** TPC-H Q17 shape (small-quantity-order revenue) — dialect-neutral,
    * executed verbatim by BOTH Spark (q56 query) and DuckDB (oracle). */
  private val sharedSqlQ17: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem, part
       WHERE p_partkey = l_partkey
         AND p_brand = 'Brand#4'
         AND l_quantity < (
           SELECT 0.2 * avg(l_quantity)
           FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  /** q233's oracle, GENERATED round-for-round from the Hilbert
    * reflect-rotate recurrence (ZOrder.withHilbert's loop): 16
    * materialized CTEs, each one round over the previous round's
    * (x, y, d). Generated, not hand-typed, so the oracle cannot drift
    * from the recurrence; MATERIALIZED keeps DuckDB from inlining the
    * rounds into an exponentially-duplicated expression tree — the
    * same blowup withHilbert's per-round projections avoid in
    * Catalyst. The xor leg uses rx,ry ∈ {0,1}, where DuckDB's
    * xor(3·rx, ry) equals the engine's bitwiseXOR term-for-term. */
  private def hilbertOracleSql(bits: Int): String = {
    val head =
      """WITH r0 AS MATERIALIZED (
           SELECT event_id,
             (LEAST(GREATEST(user_id, 0), 99999) * 65536) // 100000 AS x,
             ((LEAST(GREATEST(epoch_us(ts) // 1000000, 1704067200),
               1735689599) - 1704067200) * 65536) // 31622400 AS y,
             CAST(0 AS BIGINT) AS d
           FROM events)"""
    val rounds = (0 until bits).map { k =>
      val s = 1L << (bits - 1 - k)
      s""",
         r${k + 1} AS MATERIALIZED (
           SELECT event_id,
             CASE WHEN (y & $s) = 0 THEN CASE WHEN (x & $s) > 0
               THEN ${s - 1} - y ELSE y END ELSE x END AS x,
             CASE WHEN (y & $s) = 0 THEN CASE WHEN (x & $s) > 0
               THEN ${s - 1} - x ELSE x END ELSE y END AS y,
             d + $s*$s * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
               CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
           FROM r$k)"""
    }.mkString
    head + rounds +
      s"\nSELECT event_id, d FROM r$bits ORDER BY d, event_id"
  }

  /** q247's oracle — the Misra-Gries state replayed wave-for-wave;
    * shared verbatim by q251 (the SQL serve face). */
  private val hhServeOracleSql: String =
    """WITH t AS (
         SELECT doc_id, source AS grp,
           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS item
         FROM documents),
       w1 AS (SELECT grp, item, count(*)::BIGINT AS cnt FROM t
         WHERE (doc_id % 1000003 * 2654435761) % 4294967296 % 2 = 0
         GROUP BY grp, item),
       w2 AS (SELECT grp, item, count(*)::BIGINT AS cnt FROM t
         WHERE (doc_id % 1000003 * 2654435761) % 4294967296 % 2 = 1
         GROUP BY grp, item),
       r1 AS (SELECT *, row_number() OVER (PARTITION BY grp
           ORDER BY cnt DESC, item) AS rk FROM w1),
       o1 AS (SELECT grp, cnt AS off FROM r1 WHERE rk = 21),
       c1 AS (SELECT r1.grp, r1.item,
           r1.cnt - coalesce(o1.off, 0) AS cnt
         FROM r1 LEFT JOIN o1 USING (grp)
         WHERE r1.rk <= 20 AND r1.cnt - coalesce(o1.off, 0) > 0),
       m AS (SELECT grp, item, sum(cnt)::BIGINT AS cnt
         FROM (SELECT * FROM c1 UNION ALL SELECT * FROM w2)
         GROUP BY grp, item),
       r2 AS (SELECT *, row_number() OVER (PARTITION BY grp
           ORDER BY cnt DESC, item) AS rk FROM m),
       o2 AS (SELECT grp, cnt AS off FROM r2 WHERE rk = 21),
       c2 AS (SELECT r2.grp, r2.item,
           r2.cnt - coalesce(o2.off, 0) AS cnt
         FROM r2 LEFT JOIN o2 USING (grp)
         WHERE r2.rk <= 20 AND r2.cnt - coalesce(o2.off, 0) > 0),
       n AS (SELECT grp, count(*)::BIGINT AS n FROM t GROUP BY grp),
       d AS (SELECT n.grp,
           coalesce(o1.off, 0) + coalesce(o2.off, 0) AS d
         FROM n LEFT JOIN o1 ON n.grp = o1.grp
           LEFT JOIN o2 ON n.grp = o2.grp),
       serve AS (SELECT grp, item, cnt,
           row_number() OVER (PARTITION BY grp
             ORDER BY cnt DESC, item) AS rank FROM c2)
       SELECT s.grp, CAST(s.rank AS INT) AS rank, s.item, s.cnt,
         (s.cnt + d.d)::BIGINT AS cnt_hi
       FROM serve s JOIN d USING (grp)
       WHERE s.rank <= 10 ORDER BY grp, rank"""

  /** q229's oracle — the 2-D Morton dilation replayed shift-for-shift;
    * shared verbatim by q241 (the zvalue2 SQL face). */
  private val zorder2OracleSql: String =
    """WITH ev AS (
         SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec
         FROM events),
       b AS (
         SELECT event_id,
           (LEAST(GREATEST(user_id, 0), 99999) * 65536) // 100000 AS x,
           ((LEAST(GREATEST(sec, 1704067200), 1735689599)
             - 1704067200) * 65536) // 31622400 AS y
         FROM ev),
       s1 AS (SELECT event_id, (x | (x << 16)) & 281470681808895 AS x,
                (y | (y << 16)) & 281470681808895 AS y FROM b),
       s2 AS (SELECT event_id, (x | (x << 8)) & 71777214294589695 AS x,
                (y | (y << 8)) & 71777214294589695 AS y FROM s1),
       s3 AS (SELECT event_id, (x | (x << 4)) & 1085102592571150095 AS x,
                (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
       s4 AS (SELECT event_id, (x | (x << 2)) & 3689348814741910323 AS x,
                (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
       s5 AS (SELECT event_id, (x | (x << 1)) & 6148914691236517205 AS x,
                (y | (y << 1)) & 6148914691236517205 AS y FROM s4)
       SELECT event_id, (x | (y << 1)) AS z FROM s5
       ORDER BY z, event_id"""

  /** q235's oracle — the 3-D stride-3 cascade; shared verbatim by
    * q242 (the zvalue3 SQL face). */
  private val oracleSqlShared235: String =
    """WITH b AS (
         SELECT event_id,
           (LEAST(GREATEST(user_id, 0), 99999) * 1024) // 100000 AS x,
           ((LEAST(GREATEST(epoch_us(ts) // 1000000, 1704067200),
             1735689599) - 1704067200) * 1024) // 31622400 AS y,
           (((event_id % 1024) + 1024) % 1024 * 1024) // 1024 AS z
         FROM events),
       s1 AS (SELECT event_id,
           (x | (x << 32)) & 8725724278095871 AS x,
           (y | (y << 32)) & 8725724278095871 AS y,
           (z | (z << 32)) & 8725724278095871 AS z FROM b),
       s2 AS (SELECT event_id,
           (x | (x << 16)) & 8725728556220671 AS x,
           (y | (y << 16)) & 8725728556220671 AS y,
           (z | (z << 16)) & 8725728556220671 AS z FROM s1),
       s3 AS (SELECT event_id,
           (x | (x << 8)) & 1157144660301377551 AS x,
           (y | (y << 8)) & 1157144660301377551 AS y,
           (z | (z << 8)) & 1157144660301377551 AS z FROM s2),
       s4 AS (SELECT event_id,
           (x | (x << 4)) & 1207822528635744451 AS x,
           (y | (y << 4)) & 1207822528635744451 AS y,
           (z | (z << 4)) & 1207822528635744451 AS z FROM s3),
       s5 AS (SELECT event_id,
           (x | (x << 2)) & 1317624576693539401 AS x,
           (y | (y << 2)) & 1317624576693539401 AS y,
           (z | (z << 2)) & 1317624576693539401 AS z FROM s4)
       SELECT event_id, (x | (y << 1) | (z << 2)) AS z FROM s5
       ORDER BY z, event_id"""

  /** q244's oracle, GENERATED step-for-step from the Skilling
    * transform (HilbertCurve.index3's loop): one MATERIALIZED CTE per
    * (Q, i) inverse-undo step, then Gray encode, the t-fold, and the
    * stride-3 dilation cascade — the q233/q235 oracle discipline.
    * Generated, not hand-typed, so the oracle cannot drift from the
    * kernel; MATERIALIZED stops DuckDB from inlining the steps into an
    * exponentially-duplicated tree (each step reads x0 several times). */
  private def hilbert3OracleSql(bits: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH g0 AS MATERIALIZED (
           SELECT event_id,
             (LEAST(GREATEST(user_id, 0), 99999) * ${1L << bits}) // 100000 AS x0,
             ((LEAST(GREATEST(epoch_us(ts) // 1000000, 1704067200),
               1735689599) - 1704067200) * ${1L << bits}) // 31622400 AS x1,
             (((event_id % 1024) + 1024) % 1024 * ${1L << bits}) // 1024 AS x2
           FROM events)"""
    var k = 0
    // inverse undo: Q from 2^(bits-1) down to 2, dims 0,1,2 in order
    for (e <- (1 until bits).reverse; i <- 0 until 3) {
      val q = 1L << e; val p = q - 1
      val prev = s"g$k"; k += 1
      val step =
        if (i == 0)
          s"""SELECT event_id,
              CASE WHEN (x0 & $q) <> 0 THEN xor(x0, $p) ELSE x0 END AS x0,
              x1, x2 FROM $prev"""
        else {
          val xi = s"x$i"
          val others = Seq(1, 2).filter(_ != i).map(j => s"x$j").mkString(", ")
          s"""SELECT event_id,
              CASE WHEN ($xi & $q) <> 0 THEN xor(x0, $p)
                   ELSE xor(x0, xor(x0, $xi) & $p) END AS x0,
              CASE WHEN ($xi & $q) <> 0 THEN $xi
                   ELSE xor($xi, xor(x0, $xi) & $p) END AS $xi,
              $others FROM $prev"""
        }
      sb ++= s",\n g$k AS MATERIALIZED ($step)"
    }
    // Gray encode (x2 uses the NEW x1)
    sb ++= s""",\n gray AS MATERIALIZED (
        SELECT event_id, x0, xor(x1, x0) AS x1,
          xor(x2, xor(x1, x0)) AS x2 FROM g$k)"""
    // t = xor-fold of (Q-1 | x2 bit Q set), Q from 2^(bits-1) down to 2
    val tFold = (1 until bits).reverse.map { e =>
      val q = 1L << e
      s"CASE WHEN (x2 & $q) <> 0 THEN ${q - 1} ELSE 0 END"
    }.reduceRight((a, b) => s"xor($a, $b)")
    sb ++= s""",\n fin AS MATERIALIZED (
        SELECT event_id, xor(x0, t) AS x0, xor(x1, t) AS x1,
          xor(x2, t) AS x2
        FROM (SELECT *, $tFold AS t FROM gray))"""
    // stride-3 dilation (the q235 cascade) on the transposed words
    val masks = Seq(
      32 -> 8725724278095871L, 16 -> 8725728556220671L,
      8 -> 1157144660301377551L, 4 -> 1207822528635744451L,
      2 -> 1317624576693539401L)
    var prev = "fin"
    sb ++= s""",\n d0 AS MATERIALIZED (
        SELECT event_id, x0 & 2097151 AS x0, x1 & 2097151 AS x1,
          x2 & 2097151 AS x2 FROM fin)"""
    prev = "d0"
    masks.zipWithIndex.foreach { case ((sh, m), j) =>
      sb ++= s""",\n d${j + 1} AS MATERIALIZED (
          SELECT event_id, (x0 | (x0 << $sh)) & $m AS x0,
            (x1 | (x1 << $sh)) & $m AS x1,
            (x2 | (x2 << $sh)) & $m AS x2 FROM $prev)"""
      prev = s"d${j + 1}"
    }
    // word 0 is the most significant bit of each 3-bit group
    sb ++= s"""\nSELECT event_id, ((x0 << 2) | (x1 << 1) | x2) AS d
        FROM $prev ORDER BY d, event_id"""
    sb.toString
  }

  /** DuckDB-runnable oracle per query (same parquet tables, same column
    * names, same rounding, same ordering). */
  def oracleSql: Map[String, String] = Map(
    "q233_hilbert_curve" -> hilbertOracleSql(16),
    "q54_sql_frontend" -> sharedSqlQ3,
    "q56_correlated_subquery" -> sharedSqlQ17,
    "q45_grouping_sets" -> sharedSqlGroupingSets,
    "q46_lateral_join" -> sharedSqlLateral,
    // q27: DuckDB reads the same .vec text file and mirrors VecReader's
    // semantics — skip the header line, id = file position - 1, token 0
    // = word, reject rows without exactly dim+1 tokens. The two unnests
    // zip positionally (DuckDB aligns parallel unnests), giving the
    // line index that Spark gets from zipWithIndex.
    "q27_vec_scan" ->
      """WITH raw AS (
           SELECT unnest(string_split(content, chr(10))) AS line,
                  unnest(range(0, len(string_split(content, chr(10))))) AS pos
           FROM read_text('/root/reference/data/test.vec'))
         SELECT pos - 1 AS id,
                regexp_split_to_array(trim(line), '\s+')[1] AS word,
                300 AS dim
         FROM raw
         WHERE pos >= 1 AND len(regexp_split_to_array(trim(line), '\s+')) = 301
         ORDER BY id""",
    "q43_map_fns" ->
      """SELECT p_partkey, p_brand AS brand, 2 AS n_keys,
         'brand,type' AS keys_csv,
         upper(p_type) AS type_upper,
         CASE WHEN p_size > 20 THEN p_size END AS big_size
         FROM part ORDER BY p_partkey""",
    "q57_topk_perkey" ->
      """SELECT l_suppkey, rank, l_orderkey, l_linenumber FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rank
           FROM lineitem) t
         WHERE rank <= 3
         ORDER BY l_suppkey, rank""",
    "q58_salted_skew_join" ->
      """SELECT s_nationkey, count(*) AS n_lines,
         round(sum(l_extendedprice), 2) AS revenue
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey""",
    "q59_recall_udaf" ->
      """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id < 50),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         tr AS (SELECT query_id, neighbor_id FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(e.v[1:16], q.v[1:16]), e.vec_id) AS rank
           FROM e CROSS JOIN q) t WHERE rank <= 5),
         fl AS (SELECT query_id, neighbor_id FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(e.v, q.v), e.vec_id) AS rank
           FROM e CROSS JOIN q) t WHERE rank <= 5)
         SELECT round(count(*) / (50 * 5.0), 4) AS mean_recall
         FROM tr JOIN fl USING (query_id, neighbor_id)""",
    "q14b_window_suite" ->
      """SELECT o_custkey, o_orderkey,
         row_number() OVER w AS order_seq,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
         lag(o_orderdate, 1) OVER w AS prev_order_date
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, order_seq""",
    "q14c_window_suite2" ->
      """SELECT o_custkey, o_orderkey,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         first_value(o_orderdate) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_date,
         lead(o_orderkey, 1) OVER w AS next_order
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
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
      """WITH wo AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
         hb AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
         SELECT custkey, 'both' AS op FROM (SELECT custkey FROM wo INTERSECT SELECT custkey FROM hb) a
         UNION ALL
         SELECT custkey, 'orders_only' AS op FROM (SELECT custkey FROM wo EXCEPT SELECT custkey FROM hb) b
         ORDER BY custkey, op""",
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
    "q09b_string_fns2" ->
      """SELECT p_partkey,
         regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
         lpad(p_brand, 12, '*') AS brand_pad,
         translate(p_type, 'aeiou', '12345') AS type_tr,
         reverse(p_brand) AS brand_rev,
         repeat(p_brand, 2) AS brand_2x,
         CAST(strpos(p_name, 'a') AS INT) AS a_pos
         FROM part ORDER BY p_partkey""",
    // Spark dayofweek is 1=Sunday..7, DuckDB's is 0=Sunday..6 (+1);
    // month-interval addition clamps to month end identically.
    "q10b_date_fns" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
         CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
         CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
         CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since
         FROM orders ORDER BY o_orderkey""",
    "q13b_conditional_fns" ->
      """SELECT c_custkey,
         coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
         greatest(c_acctbal, 0.0) AS bal_floor0,
         least(c_acctbal, 1000.0) AS bal_cap1k,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg
         FROM customer ORDER BY c_custkey""",
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
    "q11b_outer_joins" ->
      """SELECT coalesce(e.k, h.k) AS k,
         CASE WHEN e.k IS NULL THEN 'high_only'
              WHEN h.k IS NULL THEN 'even_only'
              ELSE 'both' END AS side
         FROM (SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey % 2 = 0) e
         FULL OUTER JOIN (SELECT c_custkey AS k, c_mktsegment FROM customer WHERE c_acctbal > 5000) h
           ON e.k = h.k
         ORDER BY k""",
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
    // q19b: dialect-free long-form oracle — one SELECT per measure.
    // Spark's unpivot casts the value column to the common DOUBLE type.
    "q19b_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity::DOUBLE AS value FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
         WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber, metric""",
    "q14d_array_fns2" ->
      """SELECT p_partkey,
         array_to_string(list_sort(string_split(p_type, ' ')), '|') AS types_sorted,
         CAST(len(list_distinct(string_split(p_type, ' '))) AS INT) AS n_distinct_words,
         list_contains(string_split(p_type, ' '), 'PLATED') AS has_plated,
         CAST(coalesce(list_position(string_split(p_type, ' '), 'STEEL'), 0) AS INT) AS steel_pos,
         array_to_string(string_split(p_type, ' ')[1:2], '|') AS first_two,
         p_brand AS brand_again
         FROM part ORDER BY p_partkey""",
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
    "q81_filtered_knn" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])),
               e.vec_id) AS rank
           FROM (SELECT * FROM embeddings WHERE label = 3) e
           CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 20) q) t
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "q82_radius_join" ->
      """SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
         FROM embeddings e
         CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) q
         WHERE list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
               * list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
               <= 1.2535
         ORDER BY query_id, neighbor_id""",
    "q89_radius_zonemap" ->
      """SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
         FROM embeddings e
         CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) q
         WHERE list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
               * list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
               <= 1.2535
         ORDER BY query_id, neighbor_id""",
    "q86_radius_ann" ->
      """SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
         FROM embeddings e
         CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) q
         WHERE list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
               * list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
               <= 1.2535
         ORDER BY query_id, neighbor_id""",
    "q63_pq_refined" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])),
               e.vec_id) AS rank
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // constant-truth invariant bits, the q83 pattern over the
    // remaining rows-only families
    "q168_invariant_gates" ->
      """SELECT * FROM (VALUES
           ('bpe_roundtrip', 1), ('deflate_redundancy_orders', 1),
           ('fingerprint_stream_bijective', 1), ('hll_within_5pct', 1),
           ('semdedup_partition', 1), ('simhash_banded_eq_brute', 1),
           ('subwords_refine_tokens', 1)) t(component, ok)
         ORDER BY component""",
    "q83_ann_recall_gate" ->
      """SELECT * FROM (VALUES
           ('traversal', 1), ('self_bucketed', 1), ('bucketed_spill', 1),
           ('distributed', 1), ('distributed_spill', 1),
           ('ivf', 1), ('mllib_lsh', 1), ('pq_adc', 1)) t(backend, recall_ok)
         ORDER BY backend""",
    "q64_ivfpq_join" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])),
               e.vec_id) AS rank
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    "q65_sq8_codes" ->
      """SELECT vec_id, scale AS qscale,
           CAST(list_sum(codes) AS BIGINT) AS sum_code,
           CAST(list_max(codes) AS BIGINT) AS max_code,
           CAST(list_min(codes) AS BIGINT) AS min_code
         FROM (
           SELECT vec_id, scale,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)) AS codes
           FROM (
             SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
             FROM embeddings) t1
           WHERE scale > 0) t2
         ORDER BY vec_id""",
    "q67_pii_redact" ->
      """SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or +1 555 01'
                  || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                  || ' 3456 from 10.2.' || CAST(doc_id % 256 AS VARCHAR) || '.7',
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d ]{7,}\d', '<PHONE>', 'g')) AS redacted_md5
         FROM documents ORDER BY doc_id""",
    "q68_gopher_metrics" ->
      """WITH aug AS (
           SELECT doc_id, regexp_replace(text, ' table ', chr(10), 'g') AS t
           FROM documents),
         m AS (
           SELECT doc_id, t,
             list_filter(regexp_split_to_array(t, '\n'), l -> len(l) > 0) AS ls,
             regexp_split_to_array(lower(trim(t)), '\s+') AS toks
           FROM aug)
         SELECT doc_id,
           CAST(len(ls) AS INT) AS n_lines,
           CASE WHEN len(ls) <= 1 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)
           END AS dup_line_ratio,
           CASE WHEN len(t) = 0 THEN 0.0
                ELSE CAST(len(t) - len(regexp_replace(t, '[^A-Za-z0-9 ]', '', 'g'))
                     AS DOUBLE) / len(t)
           END AS symbol_ratio,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]')))
                     AS DOUBLE) / len(toks)
           END AS alpha_ratio,
           CAST((len(toks) BETWEEN 10 AND 100000)
             AND (CAST(list_sum(list_transform(toks, tk -> len(tk))) AS DOUBLE)
                  / len(toks) BETWEEN 1.0 AND 12.0)
             AND (CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(t) - len(regexp_replace(t, '[^A-Za-z0-9 ]', '', 'g'))
                       AS DOUBLE) / len(t) END <= 0.2)
             AND (CASE WHEN len(ls) <= 1 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)
                  END <= 0.3)
             AND (CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]')))
                       AS DOUBLE) / len(toks) END >= 0.8) AS INT) AS keep
         FROM m ORDER BY doc_id""",
    "q69_decontaminate" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents)
         SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
           CAST(len(list_intersect(t.sh, b.sh)) AS BIGINT) AS n_common,
           CAST(len(list_intersect(t.sh, b.sh)) AS DOUBLE) / len(b.sh) AS frac
         FROM s t, s b
         WHERE t.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
           AND CAST(len(list_intersect(t.sh, b.sh)) AS DOUBLE) / len(b.sh) >= 0.5
         ORDER BY train_id, bench_id""",
    "q66_zorder_codes" ->
      """SELECT p_partkey,
           CAST(list_sum(list_transform(range(0, 16), i ->
             ((((p_partkey % 65536) >> i) & 1) << (2*i)) +
             (((p_size >> i) & 1) << (2*i + 1)))) AS BIGINT) AS zcode
         FROM part ORDER BY p_partkey""",
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
         FROM documents""",
    "q14_array_fns" ->
      """SELECT vec_id, len(embedding) AS dim, embedding[1] AS first_val,
         list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), 'sum') AS norm_sq
         FROM embeddings ORDER BY vec_id""",
    "q15_json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
         FROM events ORDER BY event_id""",
    "q16_asof_prior_purchase" ->
      """SELECT event_id, user_id, ts, prior_purchase_ts FROM (
           SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchase_ts
           FROM events) t
         WHERE event_type = 'click' ORDER BY event_id""",
    "q20c_stats_aggs" ->
      """SELECT l_returnflag,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(var_pop(l_quantity), 4) AS var_qty,
         round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
         round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q20_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.5) AS p50,
         quantile_cont(l_extendedprice, 0.95) AS p95,
         round(quantile_cont(l_quantity, 0.25), 2) AS q1_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q17_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q18_math_fns" ->
      """SELECT l_orderkey, sqrt(l_quantity) AS sqrt_qty,
         power(l_discount, 2) AS disc_sq,
         abs(l_quantity - 25.0) AS abs_dev,
         CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
         CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
         l_orderkey % 7 AS key_mod
         FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""",
    "q19_pivot" ->
      """SELECT n_name,
         count(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS "AUTOMOBILE",
         count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS "BUILDING",
         count(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END) AS "FURNITURE",
         count(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS "HOUSEHOLD",
         count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS "MACHINERY"
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q28_knn_idsets" ->
      """SELECT query_id, neighbor_id FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])),
               e.vec_id) AS rank
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q) t
         WHERE rank <= 5 ORDER BY query_id, neighbor_id""",
    // Same exact-Jaccard SQL as q32: the seeded MinHash+LSH pair set
    // equals the exact pair set at fixture scale (full recall, also
    // asserted in TextDedupSpec), and the jac values agree because
    // 64-bit shingle-hash collisions are absent here — so this oracle
    // doubles as a recall regression gate: a banding/seed change that
    // drops a pair fails the driver compare, not just a spec.
    "q30_minhash_pairs" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jac
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         ORDER BY id_a, id_b""",
    "q32_jaccard_pairs" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jac
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         ORDER BY id_a, id_b""",
    "q38_dedup_clusters" ->
      """WITH RECURSIVE s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         pair AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM pair
               UNION SELECT id_b, id_a FROM pair),
         reach AS (
           SELECT DISTINCT src AS node, src AS r FROM e
           UNION
           SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src)
         SELECT node AS doc_id, min(r) AS cluster
         FROM reach GROUP BY node ORDER BY doc_id""",
    "q115_zipf_slope" ->
      """WITH t AS (
           SELECT tok, count(*)::BIGINT AS cnt FROM (
             SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             FROM documents) u GROUP BY tok
           ORDER BY cnt DESC, tok LIMIT 500),
         r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM t)
         SELECT count(*)::BIGINT AS n_tokens_fit,
           round(regr_slope(ln(cnt), ln(rank)), 4) AS slope,
           round(regr_intercept(ln(cnt), ln(rank)), 4) AS intercept
         FROM r""",
    // generated from the committed tokenizer asset — see BpeAssets
    "q119_bpe_token_ids" -> BpeAssets.tokenIdsOracleSql,
    "q124_pack_token_ids" -> BpeAssets.packedOracleSql(64),
    "q159_stride_chunks" -> BpeAssets.stridedOracleSql(64, 32),
    "q126_bpe_token_freq" -> BpeAssets.tokenFreqOracleSql(50),
    // q129: rank-pure metric math mirrored exactly (score values never
    // reach the output; logs are rounded post-aggregation)
    "q129_retrieval_eval" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 3),
         res AS (
           SELECT qid, doc_id, rank FROM (
             SELECT q.qid, e.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC,
                 e.vec_id) AS rank
             FROM embeddings e CROSS JOIN q) t WHERE rank <= 5),
         tr AS (
           SELECT qid, doc_id, CAST(4 - rank AS DOUBLE) AS grade FROM (
             SELECT q.qid, e.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_distance(CAST(e.embedding AS DOUBLE[]), q.qv), e.vec_id) AS rank
             FROM embeddings e CROSS JOIN q) t WHERE rank <= 3),
         hits AS (
           SELECT r.qid, r.rank, coalesce(t.grade, 0) AS grade
           FROM res r LEFT JOIN tr t ON t.qid = r.qid AND t.doc_id = r.doc_id),
         pq AS (
           SELECT qid,
             sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS hits,
             max(CASE WHEN grade > 0 THEN 1.0 / rank ELSE 0.0 END) AS rr,
             sum(grade / log2(rank + 1)) AS dcg
           FROM hits GROUP BY qid),
         ideal AS (
           SELECT qid, sum(grade / log2(irank + 1)) AS idcg FROM (
             SELECT qid, grade, row_number() OVER (PARTITION BY qid
               ORDER BY grade DESC, doc_id) AS irank FROM tr) t
           WHERE irank <= 5 GROUP BY qid),
         nrel AS (SELECT qid, count(*) AS nrel FROM tr WHERE grade > 0 GROUP BY qid)
         SELECT pq.qid, round(CAST(pq.hits AS DOUBLE) / nrel.nrel, 4) AS recall,
           round(pq.rr, 4) AS mrr,
           round(CASE WHEN ideal.idcg > 0 THEN pq.dcg / ideal.idcg ELSE 0 END, 4) AS ndcg
         FROM pq JOIN ideal USING (qid) JOIN nrel USING (qid)
         ORDER BY qid""",
    // q130: seeded-statistical floors as verdict rows
    "q130_ann_quality_gate" ->
      """SELECT * FROM (VALUES
           ('mrr_self_exact', 1), ('ndcg10_floor_085', 1),
           ('recall10_floor_080', 1)) t(component, ok)
         ORDER BY component""",
    // q128: exact top-20 token counts; cms_ok mirrors as the constant 1
    // (the sketch guarantee holds by construction at eps=0.001, δ=0.01
    // — a failure would flip the hash)
    "q128_heavy_hitters" ->
      """SELECT token, cnt, 1 AS cms_ok FROM (
           SELECT tok AS token, count(*)::BIGINT AS cnt FROM (
             SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             FROM documents) u
           WHERE tok <> '' GROUP BY tok
           ORDER BY cnt DESC, tok LIMIT 20) t
         ORDER BY cnt DESC, token""",
    // q125: per-transition conversion lags as exact integer micros —
    // the q113 CTE chain with epoch_us sums (no float path)
    "q125_funnel_timing" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
         SELECT * FROM (
           SELECT 'view' AS from_stage, 'click' AS to_stage,
             count(*)::BIGINT AS n_converted,
             coalesce(sum(epoch_us(c.t2) - epoch_us(v.t1)), 0)::BIGINT AS sum_micros
           FROM c JOIN v USING (user_id)
           UNION ALL
           SELECT 'click', 'purchase', count(*)::BIGINT,
             coalesce(sum(epoch_us(p.t3) - epoch_us(c.t2)), 0)::BIGINT
           FROM p JOIN c USING (user_id)) t
         ORDER BY from_stage""",
    "q116_regional_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem, orders, customer, supplier, nation, region
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q111_novelty" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], '')))) AS s
           FROM documents),
         ref AS (SELECT DISTINCT s FROM sh WHERE doc_id < 100),
         j AS (
           SELECT sh.doc_id, count(*)::BIGINT AS n_shingles,
             sum(CASE WHEN ref.s IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_novel
           FROM sh LEFT JOIN ref ON sh.s = ref.s GROUP BY sh.doc_id)
         SELECT doc_id, n_shingles,
           round(n_novel::DOUBLE / n_shingles, 6) AS novelty
         FROM j ORDER BY doc_id""",
    // q38's component CTE + singleton fallback + exact modular split
    "q110_leakage_split" ->
      """WITH RECURSIVE s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         pair AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM pair
               UNION SELECT id_b, id_a FROM pair),
         reach AS (
           SELECT DISTINCT src AS node, src AS r FROM e
           UNION
           SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src),
         comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
         lbl AS (
           SELECT d.doc_id, coalesce(comp.cluster, d.doc_id)::BIGINT AS cluster
           FROM documents d LEFT JOIN comp ON d.doc_id = comp.node)
         SELECT doc_id, cluster,
           CASE WHEN ((cluster % 1000000007) * 1000003 % 1000000007) % 100 < 80
                THEN 'train' ELSE 'holdout' END AS split
         FROM lbl ORDER BY doc_id""",
    "q33_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.v, b.v) >= 0.4
         ORDER BY id_a, id_b""",
    "q34_cosine_topk" ->
      """SELECT vec_id, rank FROM (
           SELECT vec_id, row_number() OVER (ORDER BY
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
             vec_id) AS rank
           FROM embeddings) t
         WHERE rank <= 10 ORDER BY rank""",
    "q40_text_stats" ->
      """SELECT doc_id,
         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens,
         length(text) AS text_chars,
         CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) = 0 THEN 0.0
           ELSE list_aggregate(list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
                  t -> length(t)), 'sum')::DOUBLE
                / len(regexp_split_to_array(lower(trim(text)), '\s+')) END AS mean_tok_len
         FROM documents ORDER BY doc_id""",
    // list literals must mirror TextAnalysis.defaultStopwords /
    // languageProfiles exactly; all constants cast to DOUBLE so DuckDB
    // doesn't fall into DECIMAL arithmetic (Spark computes IEEE doubles)
    "q42_quality_metrics" ->
      """WITH t AS (
           SELECT doc_id, text,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id,
             len(toks) AS n_tokens,
             CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                 / length(text) END AS punct_ratio,
             CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], x)))::DOUBLE
                 / len(toks) END AS stopword_ratio,
             list_max([
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['der','die','und','in','den','von','zu','das','mit','sich','des','auf'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'de'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['the','and','of','to','in','is','that','it','for','with','was','on'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'en'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['el','la','de','que','y','en','los','del','se','las','por','un'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'es'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['le','la','de','et','les','des','en','un','du','une','que','est'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'fr'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['de','a','o','que','e','do','da','em','um','para','com','uma'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'pt')]) AS best
           FROM t)
         SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
           CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.4 AS DOUBLE)
             + CASE WHEN stopword_ratio >= 0.01 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE)
             + CASE WHEN punct_ratio <= 0.2 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE) AS quality,
           CASE WHEN best.score > 0.0 THEN best.lang ELSE 'und' END AS lang_pred
         FROM m ORDER BY doc_id""",
    // q60: the stub decode is exact integer byte arithmetic with one
    // f32 rounding per lane (see Multimodal.stubDecode) — mirrored here
    // by parsing hex(payload) into a byte list, summing every 8th byte
    // per lane, and applying the identical (sum/255)/divisor → REAL
    // cast. feat_l1 then sums the 8 f32 lane values as doubles in lane
    // order, the same left fold Spark's aggregate() performs.
    "q60_media_decode" -> {
      val lanes = (0 until 8).map { j =>
        s"""CAST((list_aggregate(list_transform(range(0, n), i ->
           |  CASE WHEN i % 8 = $j THEN bytes[CAST(i+1 AS INT)] ELSE 0 END), 'sum')
           |  / 255.0) / greatest(1, n // 8 + 1) AS REAL) AS f$j""".stripMargin
      }.mkString(",\n         ")
      s"""WITH b AS (
           SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
           FROM documents),
         v AS (
           SELECT doc_id, n,
             list_transform(range(0, n), i ->
               strpos('0123456789ABCDEF', substring(h, CAST(2*i+1 AS INT), 1)) * 16
               + strpos('0123456789ABCDEF', substring(h, CAST(2*i+2 AS INT), 1)) - 17) AS bytes
           FROM b),
         f AS (
           SELECT doc_id, n, $lanes
           FROM v)
         SELECT doc_id AS media_id,
           CAST(n % 640 AS INT) AS width, CAST(n % 480 AS INT) AS height,
           8 AS n_features,
           round(list_aggregate([f0::DOUBLE, f1::DOUBLE, f2::DOUBLE, f3::DOUBLE,
             f4::DOUBLE, f5::DOUBLE, f6::DOUBLE, f7::DOUBLE], 'sum'), 4) AS feat_l1,
           round(f0::DOUBLE, 4) AS feat_0
         FROM f ORDER BY media_id"""
    },
    // q61: frame sampling is deterministic byte arithmetic — frame i
    // covers payload bytes [i·64, min((i+1)·64, n)), strided by 2, with
    // one empty frame for empty payloads (Spark's greatest(nFrames, 1)).
    "q61_media_frames" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
         CAST(least(64, octet_length(encode(text)) - i * 64) AS INT) AS frame_bytes
         FROM documents,
           LATERAL unnest(range(0, greatest(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 1))) t(i)
         WHERE i % 2 = 0
         ORDER BY media_id, frame_idx""",
    // q55: element-wise kernels mirrored in DuckDB list functions —
    // unrounded doubles are safe here because both engines do the same
    // f64 fold over the same f32 inputs in the same order (bit-exact,
    // verified); this is deliberately a kernel-parity check, unlike
    // shuffle-order-dependent aggregates which must round.
    "q55_sql_vector_fns" ->
      """SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_aggregate(list_transform(range(1, len(a.embedding)+1),
           i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
              * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)), 'sum') AS dist,
         list_aggregate(list_transform(range(1, len(a.embedding)+1),
           i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum') AS dot_ab,
         CASE WHEN sqrt(list_aggregate(list_transform(range(1, len(a.embedding)+1),
                i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, len(b.embedding)+1),
                i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')) = 0.0
           THEN 0.0
           ELSE list_aggregate(list_transform(range(1, len(a.embedding)+1),
                i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')
              / (sqrt(list_aggregate(list_transform(range(1, len(a.embedding)+1),
                   i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE), 'sum'))
               * sqrt(list_aggregate(list_transform(range(1, len(b.embedding)+1),
                   i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum'))) END AS cos_ab
         FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id < 5
         ORDER BY query_id, neighbor_id""",
    // q62: resize keeps bytes 0, 3, 6, … → output length = ceil(n/3)
    "q62_media_resize" ->
      """SELECT doc_id AS media_id,
         CAST(ceil(octet_length(encode(text)) / 3.0) AS BIGINT) AS resized_bytes
         FROM documents ORDER BY media_id""",
    "q47_hash_split" ->
      """SELECT CASE WHEN (doc_id % 1000003 * 2654435761) % 4294967296 % 100 < 90
           THEN 'train' ELSE 'val' END AS split,
         count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY split ORDER BY split""",
    "q48_vocab_topk" ->
      """SELECT token, count(*) AS freq FROM (
           SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents) t
         GROUP BY token ORDER BY freq DESC, token LIMIT 50""",
    "q72_weighted_mix" ->
      """SELECT lang, count(*) AS n_kept
         FROM documents
         WHERE (doc_id % 1000003 * 2654435761) % 4294967296 % 1000 <
           CASE WHEN lang = 'en' THEN 900
                WHEN lang = 'de' THEN 500 ELSE 100 END
         GROUP BY lang ORDER BY lang""",
    "q49_balanced_sample" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             ORDER BY (doc_id % 1000003 * 2654435761) % 4294967296, doc_id) AS rn
           FROM documents) t
         WHERE rn <= 20 ORDER BY lang, doc_id""",
    // q71: chunk layout is pure integer arithmetic on the token count —
    // same LATERAL-unnest shape as the q61 frame sampler.
    "q71_token_chunks" ->
      """SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         CAST(least(32, n - i * 32) AS INT) AS chunk_tokens
         FROM (SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n
               FROM documents) d,
           LATERAL unnest(range(0, greatest(CAST(ceil(n / 32.0) AS BIGINT), 1))) t(i)
         ORDER BY doc_id, chunk_idx""",
    // q70: the q42 metric CTEs (verbatim stopword/language lists) feed
    // a quality filter, then q38's recursive components over the
    // SURVIVING docs pick one representative per near-dup cluster, then
    // q47's hash split buckets them — one SQL mirror of the whole
    // pipeline.
    "q70_curation_pipeline" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, text, toks, len(toks) AS n_tokens,
             CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE / length(text) END AS punct_ratio,
             CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], x)))::DOUBLE
                 / len(toks) END AS stopword_ratio,
             list_max([
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['der','die','und','in','den','von','zu','das','mit','sich','des','auf'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'de'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['the','and','of','to','in','is','that','it','for','with','was','on'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'en'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['el','la','de','que','y','en','los','del','se','las','por','un'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'es'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['le','la','de','et','les','des','en','un','du','une','que','est'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'fr'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['de','a','o','que','e','do','da','em','um','para','com','uma'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'pt')]) AS best
           FROM t),
         g AS (
           SELECT doc_id, text, n_tokens,
             CASE WHEN best.score > 0.0 THEN best.lang ELSE 'und' END AS lang_pred
           FROM m
           WHERE CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.4 AS DOUBLE)
               + CASE WHEN stopword_ratio >= 0.01 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE)
               + CASE WHEN punct_ratio <= 0.2 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE) >= 0.7),
         s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM g),
         pair AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM pair
               UNION SELECT id_b, id_a FROM pair),
         reach AS (
           SELECT DISTINCT src AS node, src AS r FROM e
           UNION
           SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src),
         comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
         kept AS (
           SELECT g.doc_id, g.lang_pred, g.n_tokens
           FROM g LEFT JOIN comp ON g.doc_id = comp.node
           WHERE comp.cluster IS NULL OR comp.cluster = g.doc_id)
         SELECT CASE WHEN (doc_id % 1000003 * 2654435761) % 4294967296 % 100 < 90
             THEN 'train' ELSE 'val' END AS split,
           lang_pred, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         FROM kept GROUP BY split, lang_pred ORDER BY split, lang_pred""",
    "q48b_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
         docfreq AS (
           SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
         n AS (SELECT count(*)::DOUBLE AS n FROM documents)
         SELECT doc_id, count(*) AS n_terms,
           round(sum(tf * ln(n.n / df)), 4) AS tfidf_sum
         FROM tf JOIN docfreq USING (token), n
         GROUP BY doc_id ORDER BY doc_id""",
    "q44_doc_group_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
         round(avg(n_chars), 2) AS avg_chars,
         CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) AS total_tokens
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
    "q50_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q51_sliding_windows" ->
      """SELECT CAST(to_timestamp((floor(epoch(ts) / 900) - i) * 900) AS TIMESTAMP) AS win_start,
         event_type, count(*) AS n_events
         FROM events CROSS JOIN range(4) t(i)
         GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "q53_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         c.ts AS click_ts, p.ts AS purchase_ts
         FROM events c JOIN events p ON c.user_id = p.user_id
         WHERE c.event_type = 'click' AND p.event_type = 'purchase'
           AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts
         ORDER BY click_id, purchase_id""",
    "q112_cohort_retention" ->
      """WITH f AS (
           SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
           FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
               FROM events)
         SELECT cohort_week, activity_week, count(*)::BIGINT AS n_users
         FROM a JOIN f USING (user_id)
         GROUP BY cohort_week, activity_week
         ORDER BY cohort_week, activity_week""",
    "q114_rate_anomaly" ->
      """WITH h AS (
           SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS n
           FROM events GROUP BY event_type, date_trunc('hour', ts)),
         st AS (
           SELECT event_type, avg(n)::DOUBLE AS mean_n, stddev_samp(n)::DOUBLE AS std_n
           FROM h GROUP BY event_type)
         SELECT h.event_type, h.hour, h.n,
           round((h.n - st.mean_n) / st.std_n, 4) AS z
         FROM h JOIN st USING (event_type)
         WHERE round((h.n - st.mean_n) / st.std_n, 4) >= 2.0
         ORDER BY h.event_type, h.hour""",
    "q113_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
         SELECT 'view' AS stage, count(*)::BIGINT AS n_users FROM v
         UNION ALL SELECT 'click', count(*)::BIGINT FROM c
         UNION ALL SELECT 'purchase', count(*)::BIGINT FROM p
         ORDER BY stage""",
    // q127: the stateful state-machine path must reproduce the SAME
    // counts as the declarative chain — identical oracle to q113
    "q127_funnel_stateful" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
         SELECT 'view' AS stage, count(*)::BIGINT AS n_users FROM v
         UNION ALL SELECT 'click', count(*)::BIGINT FROM c
         UNION ALL SELECT 'purchase', count(*)::BIGINT FROM p
         ORDER BY stage""",
    // q122: the same chained-CTE mirror, one stage deeper
    "q122_funnel_4stage" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                     WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id),
         s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id)
         SELECT 'signup' AS stage, count(*)::BIGINT AS n_users FROM s1
         UNION ALL SELECT 'view', count(*)::BIGINT FROM s2
         UNION ALL SELECT 'click', count(*)::BIGINT FROM s3
         UNION ALL SELECT 'purchase', count(*)::BIGINT FROM s4
         ORDER BY stage""",
    // q123: the q113 mirror with the 24h conversion bound on each gate
    "q123_funnel_windowed" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > v.t1
                 AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > c.t2
                 AND e.ts <= c.t2 + INTERVAL 24 HOUR GROUP BY e.user_id)
         SELECT 'view' AS stage, count(*)::BIGINT AS n_users FROM v
         UNION ALL SELECT 'click', count(*)::BIGINT FROM c
         UNION ALL SELECT 'purchase', count(*)::BIGINT FROM p
         ORDER BY stage""",
    "q52_sessionize" ->
      """WITH o AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > INTERVAL 60 MINUTE THEN 1 ELSE 0 END AS new_sess
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM o)
         SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
           min(ts) AS start_ts, max(ts) AS end_ts
         FROM s GROUP BY user_id, sess_id ORDER BY user_id, start_ts""",
    "q73_unigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
         total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
         SELECT doc_id, count(*) AS n_tokens,
           round(avg(ln(CAST(cnt AS DOUBLE) / total.total)), 4) AS logprob_avg
         FROM toks JOIN counts USING (token), total
         GROUP BY doc_id ORDER BY doc_id""",
    "q76_dup_spans" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, CASE WHEN len(toks) < 3
               THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(range(len(toks) - 2),
                 i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
             END AS sh
           FROM t),
         ex AS (SELECT doc_id, unnest(sh) AS sh FROM s),
         df AS (SELECT sh, count(*) AS df FROM ex GROUP BY sh)
         SELECT ex.doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
           round(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio
         FROM ex JOIN df USING (sh)
         GROUP BY ex.doc_id ORDER BY ex.doc_id""",
    "q75_random_projection" ->
      """WITH sig AS (
           SELECT k, j,
             CASE (((1103515245*(k*64+j)+12345) % 2147483648) // 65536) % 6
               WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS s
           FROM range(8) t1(k), range(64) t2(j))
         SELECT e.vec_id, CAST(sig.k AS INTEGER) AS k,
           round(sum(sig.s * CAST(e.embedding[CAST(sig.j AS INTEGER)+1] AS DOUBLE))
             * sqrt(3.0/8), 4) AS y
         FROM embeddings e, sig
         GROUP BY e.vec_id, sig.k ORDER BY vec_id, k""",
    "q77_dim_stats" ->
      """SELECT CAST(j AS INTEGER) AS dim, count(*) AS n,
           round(avg(CAST(embedding[CAST(j AS INTEGER)+1] AS DOUBLE)), 4) AS mean,
           round(stddev_samp(CAST(embedding[CAST(j AS INTEGER)+1] AS DOUBLE)), 4) AS std,
           CAST(min(embedding[CAST(j AS INTEGER)+1]) AS DOUBLE) AS mn,
           CAST(max(embedding[CAST(j AS INTEGER)+1]) AS DOUBLE) AS mx
         FROM embeddings, range(64) t(j)
         GROUP BY j ORDER BY dim""",
    // constants cast to DOUBLE (DuckDB parses bare 1.2 as DECIMAL);
    // expression structure mirrors Bm25.score term-for-term so both
    // engines run the identical IEEE arithmetic
    "q78_bm25" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
         GROUP BY tf.doc_id ORDER BY doc_id""",
    "q85_neardup_gate" ->
      """SELECT * FROM (VALUES
           ('semdedup_no_dup_survivors', 1), ('simhash_recall', 1)) t(component, ok)
         ORDER BY component""",
    "q84_bm25_indexed_delete" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         live AS (SELECT * FROM documents WHERE doc_id % 10 <> 1),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM live),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM live),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
         GROUP BY tf.doc_id ORDER BY doc_id""",
    "q95_hybrid_indexed" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         bm AS (
           SELECT tf.doc_id,
             sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl))) AS bm25
           FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
           GROUP BY tf.doc_id),
         rb AS (
           SELECT d.doc_id, row_number() OVER (
             ORDER BY coalesce(bm.bm25, 0.0::DOUBLE) DESC, d.doc_id) AS rank_bm25
           FROM documents d LEFT JOIN bm USING (doc_id)),
         rc AS (
           SELECT vec_id AS doc_id, row_number() OVER (ORDER BY
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
             vec_id) AS rank_cos
           FROM embeddings)
         SELECT doc_id, rank_bm25, rank_cos,
           round(1.0::DOUBLE / (60 + rank_bm25) + 1.0::DOUBLE / (60 + rank_cos), 6) AS rrf
         FROM rb JOIN rc USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 20""",
    // q96: the oracle is the FULL exact MaxSim (no candidate stage) —
    // the refined serving path must recover it exactly. round(,4) on
    // the token-max sum per the DOUBLE-aggregate convention.
    "q96_maxsim" ->
      """WITH mv AS (
           SELECT vec_id // 5 AS gid, vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         q AS (SELECT vec_id, v FROM mv WHERE gid = 0),
         mx AS (
           SELECT q.vec_id AS qt, mv.gid,
             max(list_cosine_similarity(q.v, mv.v)) AS m
           FROM q CROSS JOIN mv GROUP BY q.vec_id, mv.gid),
         sc AS (SELECT gid, round(sum(m), 4) AS maxsim FROM mx GROUP BY gid)
         SELECT gid, rank, maxsim FROM (
           SELECT gid, maxsim,
             row_number() OVER (ORDER BY maxsim DESC, gid) AS rank
           FROM sc) t
         WHERE rank <= 10 ORDER BY rank""",
    "q104_maxsim_indexed" ->
      """SELECT * FROM (VALUES ('maxsim_indexed', 1)) t(component, ok)""",
    // q121: invariant gate rows (forest structure is seeded-random, so
    // the checks run Spark-side; the oracle pins the expected verdicts)
    "q121_forest_compaction" ->
      """SELECT * FROM (VALUES
           ('buckets_reduced', 1), ('radius_nonempty', 1),
           ('results_preserved', 1), ('tombstones_purged', 1),
           ('vectors_preserved', 1)) t(component, ok)
         ORDER BY component""",
    // q105: integer-exact mirrors of the index tables from the corpus:
    // postings = distinct (doc, term), sum_dl = token instances.
    "q105_index_stats" ->
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
           FROM documents),
         p AS (SELECT DISTINCT doc_id, term FROM toks)
         SELECT metric, value FROM (
           SELECT 'n_docs_indexed' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents
           UNION ALL
           SELECT 'n_docs_live', CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 10 <> 1
           UNION ALL
           SELECT 'n_docs_tombstoned', CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 10 = 1
           UNION ALL
           SELECT 'n_postings', CAST(count(*) AS BIGINT) FROM p
           UNION ALL
           SELECT 'n_positions', CAST(count(*) AS BIGINT) FROM p
           UNION ALL
           SELECT 'n_champions', CAST(sum(least(32, df)) AS BIGINT)
           FROM (SELECT count(*) AS df FROM p GROUP BY term)
           UNION ALL
           SELECT 'n_terms', CAST(count(DISTINCT term) AS BIGINT) FROM toks
           UNION ALL
           SELECT 'sum_dl_indexed', CAST(count(*) AS BIGINT) FROM toks) t
         ORDER BY metric""",
    "q100_maxsim_batch" ->
      """WITH mv AS (
           SELECT vec_id // 5 AS gid, vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         q AS (SELECT gid AS qid, vec_id, v FROM mv WHERE gid < 3),
         mx AS (
           SELECT q.qid, q.vec_id AS qt, mv.gid,
             max(list_cosine_similarity(q.v, mv.v)) AS m
           FROM q CROSS JOIN mv GROUP BY q.qid, q.vec_id, mv.gid),
         sc AS (
           SELECT qid, gid, round(sum(m), 4) AS maxsim
           FROM mx GROUP BY qid, gid)
         SELECT qid, gid, rank, maxsim FROM (
           SELECT qid, gid, maxsim,
             row_number() OVER (PARTITION BY qid ORDER BY maxsim DESC, gid) AS rank
           FROM sc) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // q101: the hash arithmetic is q49's (integer-exact in any engine);
    // pow may differ from java.lang.Math.pow in the last ulp, so the
    // priority is rounded to 6 decimals on BOTH sides before ranking.
    "q101_weighted_sample" ->
      """SELECT lang, doc_id, rank FROM (
           SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY
             round(pow(((((doc_id % 2147483647) * 2654435761) % 2147483647)
                   * 2147483629
                   + ((doc_id % 2147483629) * 2246822519) % 2147483629 + 1)
                 / 4611686018427387904.0, 1.0 / n_chars), 6) DESC, doc_id) AS rank
           FROM documents) t
         WHERE rank <= 5 ORDER BY lang, rank""",
    // q97: weights written as the exact literals the Scala passes
    // (0.7 / 0.3, each ::DOUBLE — deriving 0.3 as 1 - 0.7 would give a
    // different double). Arithmetic mirrors UnigramLm.bigramScore
    // term-for-term: (wB*cb)/cp + (wU*cu)/total, left-associated.
    "q97_bigram_logprob" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(range(len(toks) - 1), i -> toks[i+1])) AS prev,
             unnest(list_transform(range(len(toks) - 1), i -> toks[i+2])) AS cur
           FROM t WHERE len(toks) >= 2),
         bc AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY prev, cur),
         pc AS (SELECT prev, sum(cb) AS cp FROM bc GROUP BY prev),
         uct AS (
           SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS cur
           FROM documents),
         uc AS (SELECT cur, count(*) AS cu FROM uct GROUP BY cur),
         tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total FROM uc)
         SELECT bg.doc_id, count(*) AS n_bigrams,
           round(avg(ln(0.7::DOUBLE * cb / cp + 0.3::DOUBLE * cu / tot.total)), 4)
             AS logprob_avg
         FROM bg JOIN bc USING (prev, cur) JOIN pc USING (prev)
           JOIN uc USING (cur), tot
         GROUP BY bg.doc_id ORDER BY doc_id""",
    // q99: rides on q97's hash-verified score; quantile_cont is
    // DuckDB's exact interpolated percentile (same definition as
    // Spark's `percentile`, the q94 pairing) — but on EQUAL
    // interpolation neighbors DuckDB computes (1-f)·v + f·v, which is
    // an ulp off v, while Spark returns v (measured: docs sitting
    // exactly on the tercile flipped buckets). round(,4) snaps both
    // thresholds to the scores' own 1e-4 grid, where they agree.
    "q99_ccnet_buckets" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(range(len(toks) - 1), i -> toks[i+1])) AS prev,
             unnest(list_transform(range(len(toks) - 1), i -> toks[i+2])) AS cur
           FROM t WHERE len(toks) >= 2),
         bc AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY prev, cur),
         pc AS (SELECT prev, sum(cb) AS cp FROM bc GROUP BY prev),
         uct AS (
           SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS cur
           FROM documents),
         uc AS (SELECT cur, count(*) AS cu FROM uct GROUP BY cur),
         tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total FROM uc),
         sc AS (
           SELECT bg.doc_id,
             round(avg(ln(0.7::DOUBLE * cb / cp + 0.3::DOUBLE * cu / tot.total)), 4)
               AS logprob_avg
           FROM bg JOIN bc USING (prev, cur) JOIN pc USING (prev)
             JOIN uc USING (cur), tot
           GROUP BY bg.doc_id),
         thr AS (
           SELECT round(quantile_cont(logprob_avg, 0.3333333333333333), 4) AS t33,
             round(quantile_cont(logprob_avg, 0.6666666666666666), 4) AS t67
           FROM sc)
         SELECT doc_id,
           CASE WHEN logprob_avg < t33 THEN 'tail'
                WHEN logprob_avg < t67 THEN 'middle'
                ELSE 'head' END AS bucket
         FROM sc, thr ORDER BY doc_id""",
    // q98: per-row LATERAL argmax is the readable oracle form; the
    // engine's union-tag merge must produce the identical picks
    // (latest o_orderdate <= ts, max o_orderkey on date ties).
    "q98_pit_feature_join" ->
      """SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
         FROM events e LEFT JOIN LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
           ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON TRUE
         WHERE e.event_type = 'click'
         ORDER BY event_id""",
    // q102: LATERAL min-distance argmax mirrors the engine's pick
    // exactly: backward ties take the greatest orderkey (the as-of
    // convention), forward ties the smallest, equal distances go
    // backward. epoch() and Spark's timestamp→double cast derive the
    // same IEEE double from the same integer timestamp.
    "q102_nearest_join" ->
      """SELECT e.event_id, e.user_id, e.ts, o.near_orderkey
         FROM events e LEFT JOIN LATERAL (
           SELECT o_orderkey AS near_orderkey FROM orders
           WHERE o_custkey = e.user_id
             AND abs(epoch(o_orderdate) - epoch(e.ts)) <= 2592000.0
           ORDER BY abs(epoch(o_orderdate) - epoch(e.ts)) ASC,
             CASE WHEN o_orderdate <= e.ts THEN 0 ELSE 1 END ASC,
             CASE WHEN o_orderdate <= e.ts THEN -o_orderkey ELSE o_orderkey END ASC
           LIMIT 1) o ON TRUE
         WHERE e.event_type = 'click'
         ORDER BY event_id""",
    "q79_hybrid_rrf" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         bm AS (
           SELECT tf.doc_id,
             sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl))) AS bm25
           FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
           GROUP BY tf.doc_id),
         rb AS (
           SELECT d.doc_id, row_number() OVER (
             ORDER BY coalesce(bm.bm25, 0.0::DOUBLE) DESC, d.doc_id) AS rank_bm25
           FROM documents d LEFT JOIN bm USING (doc_id)),
         rc AS (
           SELECT vec_id AS doc_id, row_number() OVER (ORDER BY
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
             vec_id) AS rank_cos
           FROM embeddings)
         SELECT doc_id, rank_bm25, rank_cos,
           round(1.0::DOUBLE / (60 + rank_bm25) + 1.0::DOUBLE / (60 + rank_cos), 6) AS rrf
         FROM rb JOIN rc USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 20""",
    // q79's legs fused linearly: min-max normalization per leg, convex
    // weights with 1−w computed in doubles exactly as the engine does
    "q164_hybrid_linear" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         bm AS (
           SELECT tf.doc_id,
             sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl))) AS bm25
           FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
           GROUP BY tf.doc_id),
         sb AS (
           SELECT d.doc_id, coalesce(bm.bm25, 0.0::DOUBLE) AS s
           FROM documents d LEFT JOIN bm USING (doc_id)),
         sc AS (
           SELECT vec_id AS doc_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS s
           FROM embeddings),
         na AS (
           SELECT doc_id, CASE WHEN mx > mn THEN (s - mn) / (mx - mn)
             ELSE 0.0::DOUBLE END AS n
           FROM sb, (SELECT min(s) AS mn, max(s) AS mx FROM sb)),
         nb AS (
           SELECT doc_id, CASE WHEN mx > mn THEN (s - mn) / (mx - mn)
             ELSE 0.0::DOUBLE END AS n
           FROM sc, (SELECT min(s) AS mn, max(s) AS mx FROM sc))
         SELECT na.doc_id, round(na.n, 6) AS norm_a, round(nb.n, 6) AS norm_b,
           round(0.7::DOUBLE * na.n + (1.0::DOUBLE - 0.7::DOUBLE) * nb.n, 6) AS fused
         FROM na JOIN nb ON na.doc_id = nb.doc_id
         ORDER BY fused DESC, na.doc_id LIMIT 20""",
    "q80_bm25_batch" ->
      """WITH q AS (
           SELECT DISTINCT doc_id AS query_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id IN (0, 1, 2)),
         allterms AS (SELECT DISTINCT term FROM q),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN allterms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT q.query_id, tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) JOIN q USING (term), stats
         GROUP BY q.query_id, tf.doc_id ORDER BY query_id, doc_id""",
    // q103: q87's exact-Jaccard pair CTE with the delete schedule
    // folded into the rejection predicate — a phase-2 doc is rejected
    // by an in-batch predecessor (ida >= 250) or a SURVIVING store doc
    // (ida < 250 with ida % 10 <> 1); deleted store docs reject nobody.
    "q103_signature_delete" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         pair AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         rej AS (
           SELECT DISTINCT idb AS doc_id FROM pair
           WHERE idb < 250
              OR (idb >= 250 AND (ida >= 250 OR ida % 10 <> 1)))
         SELECT d.doc_id FROM documents d
         WHERE d.doc_id NOT IN (SELECT doc_id FROM rej)
         ORDER BY doc_id""",
    "q87_ingest_dedup" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         rej AS (
           SELECT DISTINCT b.doc_id
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5)
         SELECT d.doc_id FROM documents d
         WHERE d.doc_id NOT IN (SELECT doc_id FROM rej)
         ORDER BY doc_id""",
    // q87's admitted set composed with the q146-style BM25 replay:
    // the gated pipeline's standing index must serve exactly fresh
    // BM25 over the admission survivors
    "q169_gated_ingest" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         rej AS (
           SELECT DISTINCT b.doc_id
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         nd AS (
           SELECT doc_id, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM rej)),
         terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM nd WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM nd),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM nd),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
         GROUP BY tf.doc_id ORDER BY doc_id""",
    // q173: brute KNN mirror (q64's frame), rank from posexplode ≡
    // row_number over (distance, id)
    "q173_sql_knn" ->
      """SELECT query_id, rank, neighbor_id FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])),
               e.vec_id) AS rank
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // q174: the indexed2 leg deliberately reuses the adhoc2 SQL — the
    // positional index serves ad-hoc-over-live bit-for-bit (specced),
    // so identical SQL IS the oracle claim. Positions via DuckDB's
    // zipping multi-unnest; occurrence = every phrase offset witnessed
    // at the same (doc, pos − off) start.
    "q174_phrase_search" ->
      """WITH live AS (SELECT * FROM documents WHERE doc_id % 7 <> 3),
         arr AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
           FROM live),
         pos AS (
           SELECT doc_id, unnest(range(len(a))) AS pos, unnest(a) AS token
           FROM arr),
         dl AS (SELECT doc_id, len(a) AS dl FROM arr),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         ph0 AS (
           SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS pa
           FROM documents WHERE doc_id = 0),
         ph2 AS (SELECT unnest(range(2)) AS off, unnest(pa[1:2]) AS term FROM ph0),
         ph3 AS (SELECT unnest(range(3)) AS off, unnest(pa[1:3]) AS term FROM ph0),
         hits2 AS (
           SELECT doc_id, pos - off AS start
           FROM pos JOIN ph2 ON token = term
           GROUP BY doc_id, pos - off HAVING count(DISTINCT off) = 2),
         tf2 AS (SELECT doc_id, count(*) AS phrase_tf FROM hits2 GROUP BY doc_id),
         df2 AS (SELECT count(*) AS df FROM tf2),
         hits3 AS (
           SELECT doc_id, pos - off AS start
           FROM pos JOIN ph3 ON token = term
           GROUP BY doc_id, pos - off HAVING count(DISTINCT off) = 3),
         tf3 AS (SELECT doc_id, count(*) AS phrase_tf FROM hits3 GROUP BY doc_id),
         df3 AS (SELECT count(*) AS df FROM tf3),
         leg2 AS (
           SELECT doc_id, phrase_tf,
             round(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (phrase_tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (phrase_tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl)), 4) AS bm25
           FROM tf2 JOIN dl USING (doc_id), df2, stats),
         leg3 AS (
           SELECT doc_id, phrase_tf,
             round(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (phrase_tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (phrase_tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl)), 4) AS bm25
           FROM tf3 JOIN dl USING (doc_id), df3, stats)
         SELECT 'adhoc2' AS form, doc_id, phrase_tf, bm25 FROM leg2
         UNION ALL SELECT 'indexed2', doc_id, phrase_tf, bm25 FROM leg2
         UNION ALL SELECT 'adhoc3', doc_id, phrase_tf, bm25 FROM leg3
         ORDER BY form, doc_id""",
    // q175: both serving legs mirrored end to end — champion selection
    // (per-term top-32 by exact weight, id tiebreak) included
    "q175_bm25_champions" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         wt AS (
           SELECT doc_id, term,
             ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl)) AS w
           FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats),
         scored AS (
           SELECT doc_id, count(*) AS n_matched, round(sum(w), 4) AS bm25
           FROM wt GROUP BY doc_id),
         ranked AS (
           SELECT doc_id, n_matched, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
           FROM scored),
         champ AS (
           SELECT term, doc_id FROM (
             SELECT term, doc_id,
               row_number() OVER (PARTITION BY term
                 ORDER BY round(w, 4) DESC, doc_id) AS rn
             FROM wt) t WHERE rn <= 32),
         cand AS (SELECT DISTINCT doc_id FROM champ),
         tiered AS (
           SELECT doc_id, n_matched, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
           FROM scored JOIN cand USING (doc_id))
         SELECT 'full' AS form, rank, doc_id, n_matched, bm25
         FROM ranked WHERE rank <= 10
         UNION ALL
         SELECT 'tiered', rank, doc_id, n_matched, bm25
         FROM tiered WHERE rank <= 10
         ORDER BY form, rank""",
    // q179: generated from the committed piece table — a linear
    // recursive CTE replays MaxMatch's single-successor consumption
    "q179_maxmatch_ids" -> PieceAssets.maxMatchOracleSql,
    // q181: constant truth — every tokenizer invariant must hold
    "q181_tokenizer_gates" ->
      """SELECT * FROM (VALUES
           ('em_monotone_likelihood', 1), ('probs_normalized', 1),
           ('viterbi_le_chars', 1), ('viterbi_le_maxmatch', 1),
           ('viterbi_roundtrip', 1)) t(component, ok)
         ORDER BY component""",
    // q184: both token streams replayed by the generated CTEs —
    // the same truths as q119 and q179, stacked with a form label
    "q184_sql_tokenize" ->
      s"""SELECT 'bpe' AS form, doc_id, pos, token_id
            FROM (${BpeAssets.tokenIdsOracleSql}) b
          UNION ALL
          SELECT 'maxmatch' AS form, doc_id, pos, token_id
            FROM (${PieceAssets.maxMatchOracleSql}) m
          ORDER BY form, doc_id, pos""",
    // q187: q175's champion selection + candidate-bounded rescore,
    // tiered leg only — the maintained tier must serve the same top-10
    "q187_maintained_champions" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         wt AS (
           SELECT doc_id, term,
             ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl)) AS w
           FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats),
         scored AS (
           SELECT doc_id, count(*) AS n_matched, round(sum(w), 4) AS bm25
           FROM wt GROUP BY doc_id),
         champ AS (
           SELECT term, doc_id FROM (
             SELECT term, doc_id,
               row_number() OVER (PARTITION BY term
                 ORDER BY round(w, 4) DESC, doc_id) AS rn
             FROM wt) t WHERE rn <= 32),
         cand AS (SELECT DISTINCT doc_id FROM champ),
         tiered AS (
           SELECT doc_id, n_matched, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
           FROM scored JOIN cand USING (doc_id))
         SELECT rank, doc_id, n_matched, bm25
         FROM tiered WHERE rank <= 10 ORDER BY rank""",
    // q197: brute replay — the banded join is pigeonhole-EXACT at
    // ham ≤ 7, so the oracle's all-pairs form must match it row for row
    "q197_bq_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         jit AS (SELECT vec_id + 100000 AS vec_id,
             list_concat(
               list_transform(v[1:(vec_id % 5)], x -> -x),
               v[(vec_id % 5) + 1:]) AS v
           FROM e),
         u AS (SELECT * FROM e UNION ALL SELECT * FROM jit),
         pairs AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             len(list_filter(range(1, len(a.v) + 1),
                 i -> (a.v[i] < 0) <> (b.v[i] < 0))) AS ham,
             list_cosine_similarity(a.v, b.v) AS c
           FROM u a JOIN u b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, ham, round(c, 4) AS cos
         FROM pairs WHERE ham <= 7 ORDER BY id_a, id_b""",
    // q196: both legs replayed from one (anchor, same)-partitioned
    // row_number — the oracle mirror of the composite-key heap
    "q196_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
             CAST(embedding AS DOUBLE[]) v FROM embeddings),
         a AS (SELECT vec_id AS anchor_id, label AS albl, v AS av
           FROM e WHERE vec_id % 25 = 0),
         j AS (
           SELECT a.anchor_id, e.vec_id AS neg_id,
             (e.label = a.albl) AS same,
             list_cosine_similarity(e.v, a.av) AS c
           FROM e CROSS JOIN a WHERE e.vec_id <> a.anchor_id),
         t AS (SELECT *, row_number() OVER (PARTITION BY anchor_id, same
             ORDER BY c DESC, neg_id) AS rank
           FROM j),
         p AS (SELECT anchor_id, c AS poscos FROM t WHERE same AND rank = 1)
         SELECT t.anchor_id, t.rank, t.neg_id, round(t.c, 4) AS neg_cos,
           round(p.poscos - t.c, 4) AS margin
         FROM t LEFT JOIN p USING (anchor_id)
         WHERE NOT t.same AND t.rank <= 5
         ORDER BY t.anchor_id, t.rank""",
    // q195: q191's closed-form waterfill CTE chain, then the budgeted
    // prefix-take replayed with the same Knuth ordering
    "q195_recipe_select" ->
      """WITH dt AS (
           SELECT doc_id, source,
             len(regexp_split_to_array(lower(trim(text)), '\s+'))::BIGINT AS t
           FROM documents),
         toks AS (SELECT source, 1 + length(source) % 3 AS p,
             sum(t)::BIGINT AS toks
           FROM dt GROUP BY source),
         caps AS (SELECT source, p, 4 * toks AS cap FROM toks),
         tot AS (SELECT sum(p)::BIGINT AS pp,
                   ((7 * sum(toks)::BIGINT) // 2)::BIGINT AS b FROM toks),
         f AS (
           SELECT c.source, c.p, c.cap, t.pp, t.b,
             coalesce(sum(c.cap) OVER w, 0)::BIGINT AS cumcap,
             coalesce(sum(c.p) OVER w, 0)::BIGINT AS cump
           FROM caps c, tot t
           WINDOW w AS (ORDER BY c.cap::DOUBLE / c.p, c.source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         g AS (SELECT *, (cap * (pp - cump) < p * (b - cumcap)) AS capped FROM f),
         ca AS (
           SELECT coalesce(sum(CASE WHEN capped THEN cap END), 0)::BIGINT AS c,
             coalesce(sum(CASE WHEN capped THEN p END), 0)::BIGINT AS pc
           FROM g),
         alloc AS (
           SELECT g.source,
             (CASE WHEN g.capped THEN g.cap
               ELSE (g.p * (g.b - ca.c)) // (g.pp - ca.pc) END)::BIGINT AS alloc
           FROM g, ca),
         sel AS (
           SELECT d.source, d.t,
             sum(d.t) OVER (PARTITION BY d.source
               ORDER BY (d.doc_id * 2654435761) % 4294967296, d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM dt d)
         SELECT s.source, count(*)::BIGINT AS n_docs,
           sum(s.t)::BIGINT AS sel_tokens, a.alloc,
           round(sum(s.t)::DOUBLE / a.alloc, 6) AS util
         FROM sel s JOIN alloc a USING (source)
         WHERE s.cum <= a.alloc
         GROUP BY s.source, a.alloc ORDER BY s.source""",
    // q194: constant-truth gate rows (q130's pattern)
    "q194_ivf_bq_gate" ->
      """SELECT * FROM (VALUES
           ('bq_cut_within_5pp_of_ivf', 1),
           ('full_oversample_equals_ivf', 1), ('recall10_floor_060', 1))
           t(component, ok)
         ORDER BY component""",
    // q193: the asymmetric first pass replayed term for term — the
    // ±1 reconstruction inside a list lambda, same sequential
    // accumulation order as the codegen'd loop
    "q193_bq_asym" -> bqAsymOracleSql,
    // q198: the SQL-frontend face of the same pipeline — one oracle,
    // DataFrame and spark.sql surfaces both hash against it
    "q198_sql_bq" -> bqAsymOracleSql,
    // q199: constant-truth gate bits (recall floors measured in-engine
    // against the exact oracle; a floor breach flips the hash)
    "q199_nsw_gate" ->
      """SELECT * FROM (VALUES
           ('filtered_recall5_floor_090', 1),
           ('mrr_self_exact', 1), ('ndcg10_floor_090', 1),
           ('recall10_floor_090', 1)) t(component, ok)
         ORDER BY component""",
    // q200: same lexical difficulty score (difficulty rounded 4dp as
    // the sort key — ln is libm-sensitive; mean_wlen/ttr stay raw,
    // they're exact IEEE integer ratios), DuckDB's real ntile window
    // against the engine's arithmetic phase cut
    "q200_curriculum" -> curriculumOracleSql,
    // q210: the SAME oracle string, verbatim — one truth for the
    // DataFrame curriculum and its SQL face (difficulty_score + real
    // Spark-SQL windows)
    "q210_sql_curriculum" -> curriculumOracleSql,
    // q204: the sample formula, halving truncation, envelope bits and
    // pair Hamming replayed in SQL; banding is pigeonhole-exact at
    // ham <= 7 so the all-pairs form matches row for row
    "q204_audio_neardup" -> audioNearDupOracleSql,
    // q205: the SAME oracle string, verbatim — one truth for both
    // engine surfaces (DataFrame banding machinery vs SQL frontend)
    "q205_sql_audio" -> audioNearDupOracleSql,
    // q206: constant-truth lifecycle bits (exact equalities, not
    // floors — NSW serve is deterministic and the gate beam is
    // exhaustive)
    "q206_nsw_lifecycle" ->
      """SELECT * FROM (VALUES
           ('compact_graph_eq_fresh_fit', 1),
           ('compact_purges_to_live_count', 1),
           ('maintained_serve_eq_fresh', 1),
           ('tombstones_never_surface', 1)) t(component, ok)
         ORDER BY component""",
    // q208: q171's admitted-CTE counts (the waves replay its schedule,
    // and admission is order-independent, so the admitted set is the
    // same plain SQL); the graph-store halves are in-engine EXACT
    // equality bits (maintained ≡ fresh fit — the q206 invariant as a
    // standing-table property)
    "q208_nsw_fold" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         rej AS (
           SELECT DISTINCT b.doc_id
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         adm AS (
           SELECT doc_id FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM rej))
         SELECT * FROM (VALUES
           ('n_edited', (SELECT count(*) FROM adm WHERE doc_id % 10 = 1)),
           ('n_live', (SELECT count(*) FROM adm WHERE doc_id % 10 <> 2)),
           ('n_removed', (SELECT count(*) FROM adm WHERE doc_id % 10 = 2)),
           ('nsw_covers_deduped_live', 1),
           ('nsw_ids_subset_live', 1),
           ('nsw_serve_eq_fresh', 1),
           ('nsw_store_eq_fresh', 1)) t(component, val)
         ORDER BY component""",
    // q245: the SAME admitted-CTE counts as q208 (the waves replay
    // q171's schedule and admission is order-independent), plus the
    // count-model store halves as in-engine EXACT equality bits
    // (maintained ≡ fresh fit of the live admitted set — count
    // additivity for NB/LM, the dropDocs superset argument for the
    // sample; the union-only sketch families moved to q252)
    "q245_store_fold" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         rej AS (
           SELECT DISTINCT b.doc_id
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         adm AS (
           SELECT doc_id FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM rej))
         SELECT * FROM (VALUES
           ('lm_store_eq_fresh', 1),
           ('log_live_eq_expected', 1),
           ('n_edited', (SELECT count(*) FROM adm WHERE doc_id % 10 = 1)),
           ('n_live', (SELECT count(*) FROM adm WHERE doc_id % 10 <> 2)),
           ('n_removed', (SELECT count(*) FROM adm WHERE doc_id % 10 = 2)),
           ('nb_store_eq_fresh', 1),
           ('sample_store_eq_fresh', 1)) t(component, val)
         ORDER BY component""",
    // q246: MG guarantee bits (deterministic, verified in-engine
    // against the exact fixture-scale recompute) + the mirrored
    // group count; round-12 adds the exact-d bound bits and the
    // non-heavy-takedown wave's post-removal guarantees
    "q246_hh_store" ->
      """SELECT * FROM (VALUES
           ('counters_le_k', 1),
           ('d_le_classic_bound', 1),
           ('est_le_true', 1),
           ('heavies_all_present', 1),
           ('n_groups', (SELECT count(DISTINCT source) FROM documents)),
           ('n_tracked_exact', 1),
           ('takedown_exact_applied', 1),
           ('takedown_post_est_le_true', 1),
           ('takedown_post_heavies_present', 1),
           ('takedown_post_n_exact', 1),
           ('takedown_post_under_le_d', 1),
           ('undercount_within_bound', 1)) t(component, val)
         ORDER BY component""",
    // q247: the Misra-Gries state replayed wave-for-wave — exact
    // counts per wave, rank with item tiebreak, (k+1)-th-largest
    // offset subtraction, re-merge, re-compress, top-10 serve with
    // the exact-d error envelope (d = Σ offsets, replayed from the
    // same o1/o2 CTEs). Pure integer arithmetic end to end.
    // Shared VERBATIM by q251 (the SQL serve face over the same
    // schedule — one truth, two engine surfaces).
    "q247_hh_serve" -> hhServeOracleSql,
    "q251_sql_hh_serve" -> hhServeOracleSql,
    // q252: deferral bits + staleness counts are in-engine constants
    // (the waves are scripted); n_live mirrors the admission CTE over
    // the even-id subset minus the four takedown slices
    "q252_fold_deferred_takedown" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents WHERE doc_id % 16 = 0),
         rej AS (
           SELECT DISTINCT b.doc_id
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         adm AS (
           SELECT doc_id FROM documents
           WHERE doc_id % 16 = 0
             AND doc_id NOT IN (SELECT doc_id FROM rej))
         SELECT * FROM (VALUES
           ('deferred_after_t1', 1),
           ('final_hh_eq_fresh', 1),
           ('final_hll_eq_fresh', 1),
           ('final_kll_n_exact', 1),
           ('final_sample_eq_fresh', 1),
           ('n_live', (SELECT count(*) FROM adm
              WHERE doc_id % 20 NOT IN (4, 8))),
           ('refit_cleared_at_threshold', 1),
           ('refit_n_exact_at_threshold', 1)) t(component, val)
         ORDER BY component""",
    // q255: every served total is an exact function of the live
    // admitted set after the takedown-wave refit — mirrored through
    // the admission CTE over the even-eighth subset
    "q255_store_maintenance" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents WHERE doc_id % 16 = 0),
         rej AS (
           SELECT DISTINCT b.doc_id
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         live AS (
           SELECT doc_id, text, lang, source, n_chars FROM documents
           WHERE doc_id % 16 = 0
             AND doc_id % 32 <> 16
             AND doc_id NOT IN (SELECT doc_id FROM rej))
         SELECT * FROM (VALUES
           ('hh_items_total', (SELECT coalesce(sum(
              len(regexp_split_to_array(lower(trim(text)), '\s+'))), 0)::BIGINT
              FROM live)),
           ('hll_groups', (SELECT count(DISTINCT lang) FROM live)),
           ('kll_n_total', (SELECT count(n_chars) FROM live)),
           ('n_live', (SELECT count(*) FROM live))) t(component, val)
         ORDER BY component""",
    // q256: exact per-group n on both sides of the portable-hash
    // split; quantile legs are in-engine rank-window bits (randomized
    // KLL, the declared statistical-oracle policy)
    "q256_quantile_drift" ->
      """WITH h AS (
           SELECT source AS grp, n_chars,
             (doc_id // 20) % 2 AS w
           FROM documents)
         SELECT grp,
           count(CASE WHEN w = 0 THEN n_chars END)::BIGINT AS n_a,
           count(CASE WHEN w = 1 THEN n_chars END)::BIGINT AS n_b,
           1 AS drift_rank_ok
         FROM h GROUP BY grp
         HAVING count(CASE WHEN w = 0 THEN n_chars END) > 0
            AND count(CASE WHEN w = 1 THEN n_chars END) > 0
         ORDER BY grp""",
    // q257: the maxStale serve face — the post-refresh store is in
    // MG's exact regime, so the served top-10 is the exact per-source
    // token top-10 over the live slice with a zero error envelope;
    // the lifecycle bits (stale → refreshed → ≡ fresh fit) are
    // in-engine constants
    "q257_serve_max_stale" ->
      """WITH live AS (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id % 16 = 0 AND doc_id % 32 <> 16),
         toks AS (
           SELECT source AS grp,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS item
           FROM live),
         cnts AS (
           SELECT grp, item, count(*)::BIGINT AS cnt
           FROM toks GROUP BY grp, item),
         ranked AS (
           SELECT grp, item, cnt, row_number() OVER (
             PARTITION BY grp ORDER BY cnt DESC, item) AS rank
           FROM cnts)
         SELECT grp, CAST(rank AS INT) AS rank, item, cnt,
           cnt AS cnt_hi, 1 AS lifecycle_ok
         FROM ranked WHERE rank <= 10 ORDER BY grp, rank""",
    // q258: the merged store is in the exact regime end to end
    // (d_a = d_b = o_merge = 0), so the federated serve is the exact
    // per-source token top-10 over the UNION of the two slices with a
    // zero envelope
    "q258_store_federation" ->
      """WITH toks AS (
           SELECT source AS grp,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS item
           FROM documents
           WHERE doc_id % 32 = 0 OR doc_id % 32 = 8),
         cnts AS (
           SELECT grp, item, count(*)::BIGINT AS cnt
           FROM toks GROUP BY grp, item),
         ranked AS (
           SELECT grp, item, cnt, row_number() OVER (
             PARTITION BY grp ORDER BY cnt DESC, item) AS rank
           FROM cnts)
         SELECT grp, CAST(rank AS INT) AS rank, item, cnt,
           cnt AS cnt_hi
         FROM ranked WHERE rank <= 10 ORDER BY grp, rank""",
    // q259: merged NB model ≡ a token-count replay of the union slice
    // — additive integers, no envelope; n_c/t_c are the per-class doc
    // and token masses of the union
    "q259_nb_federation" ->
      """WITH sl AS (
           SELECT lang AS label, text FROM documents
           WHERE doc_id % 16 = 1 OR doc_id % 16 = 9),
         toks AS (
           SELECT label,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM sl),
         cnts AS (
           SELECT label, token, count(*)::BIGINT AS cnt
           FROM toks GROUP BY label, token),
         cls AS (
           SELECT label, count(*)::BIGINT AS n_c,
             sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))::BIGINT
               AS t_c
           FROM sl GROUP BY label),
         ranked AS (
           SELECT label, token, cnt, row_number() OVER (
             PARTITION BY label ORDER BY cnt DESC, token) AS rank
           FROM cnts)
         SELECT r.label, CAST(r.rank AS INT) AS rank, r.token, r.cnt,
           c.n_c, c.t_c
         FROM ranked r JOIN cls c USING (label)
         WHERE r.rank <= 5 ORDER BY r.label, r.rank""",
    // q260: merged trigram LM ≡ an n-gram replay of the union slice;
    // docs under 3 (resp. 2) tokens contribute no trigrams (bigrams),
    // mirroring the engine's sequence guard
    "q260_lm_federation" ->
      """WITH t AS (
           SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE doc_id % 16 = 3 OR doc_id % 16 = 11),
         tri AS (
           SELECT struct_extract(g, 'p1') AS p1,
             struct_extract(g, 'p2') AS p2,
             struct_extract(g, 'cur') AS cur
           FROM (SELECT unnest(list_transform(range(len(tk) - 2),
             i -> struct_pack(p1 := tk[i+1], p2 := tk[i+2],
               cur := tk[i+3]))) AS g
             FROM t WHERE len(tk) >= 3)),
         cnts AS (
           SELECT p1, p2, cur, count(*)::BIGINT AS c3
           FROM tri GROUP BY p1, p2, cur),
         tots AS (
           SELECT
             coalesce(sum(greatest(len(tk) - 2, 0)), 0)::BIGINT AS tri_total,
             coalesce(sum(CASE WHEN len(tk) >= 2 THEN len(tk) - 1
               ELSE 0 END), 0)::BIGINT AS bi_total,
             coalesce(sum(len(tk)), 0)::BIGINT AS uni_total
           FROM t)
         SELECT p1, p2, cur, c3, tri_total, bi_total, uni_total
         FROM cnts CROSS JOIN tots
         ORDER BY c3 DESC, p1, p2, cur LIMIT 20""",
    // q261: merged BM25 index ≡ the q78 replay over the union slice —
    // df/stats additivity under doc-disjointness makes the merged
    // weights bit-identical to a one-shot index of the union
    "q261_bm25_federation" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         live AS (SELECT * FROM documents
           WHERE doc_id % 16 = 5 OR doc_id % 16 = 13),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM live),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM live),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
         GROUP BY tf.doc_id ORDER BY doc_id""",
    // q262: exact-regime HH drift ≡ a full-outer token-count replay of
    // both slices; envelope degenerate (d = 0 both sides)
    "q262_hh_drift" ->
      """WITH ta AS (
           SELECT lang AS grp,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS item
           FROM documents WHERE doc_id % 16 = 7),
         tb AS (
           SELECT lang AS grp,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS item
           FROM documents WHERE doc_id % 16 = 15),
         ca AS (SELECT grp, item, count(*)::BIGINT AS est_a
                FROM ta GROUP BY grp, item),
         cb AS (SELECT grp, item, count(*)::BIGINT AS est_b
                FROM tb GROUP BY grp, item),
         na AS (SELECT grp, count(*)::BIGINT AS n_a FROM ta GROUP BY grp),
         nb AS (SELECT grp, count(*)::BIGINT AS n_b FROM tb GROUP BY grp),
         j AS (
           SELECT coalesce(ca.grp, cb.grp) AS grp,
             coalesce(ca.item, cb.item) AS item,
             coalesce(est_a, 0)::BIGINT AS est_a,
             coalesce(est_b, 0)::BIGINT AS est_b,
             CASE WHEN ca.item IS NULL THEN 'new'
                  WHEN cb.item IS NULL THEN 'vanished'
                  ELSE 'both' END AS status
           FROM ca FULL JOIN cb ON ca.grp = cb.grp AND ca.item = cb.item),
         w AS (
           SELECT j.grp, j.item, j.est_a, j.est_b,
             coalesce(n_a, 0)::BIGINT AS n_a,
             coalesce(n_b, 0)::BIGINT AS n_b,
             (j.est_b - j.est_a)::BIGINT AS delta_est, j.status
           FROM j LEFT JOIN na ON na.grp = j.grp
           LEFT JOIN nb ON nb.grp = j.grp),
         r AS (
           SELECT w.*, row_number() OVER (
             PARTITION BY grp ORDER BY delta_est DESC, item) AS rank
           FROM w)
         SELECT grp, CAST(rank AS INT) AS rank, item, est_a, est_b,
           n_a, n_b, delta_est, delta_est AS delta_lo,
           delta_est AS delta_hi, status
         FROM r WHERE rank <= 10 ORDER BY grp, rank""",
    // q263: exact-regime federated IVF serve ≡ the true top-10 of the
    // union slice (the q22 distance arithmetic; squared-vs-plain
    // euclidean orderings coincide)
    "q263_ann_federation" ->
      """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_distance(CAST(e.embedding AS DOUBLE[]),
                 CAST(q.embedding AS DOUBLE[])), e.vec_id) AS rank
           FROM (SELECT * FROM embeddings
                 WHERE vec_id % 16 = 1 OR vec_id % 16 = 9) e
           CROSS JOIN (SELECT * FROM embeddings WHERE vec_id % 97 = 0) q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // q264: the federated decontamination replayed whole — union
    // benchmark shingle counts (exact regime on both sides and in the
    // merge), tie-broken top-20 per lang, containment, keep/drop
    "q264_federated_decontaminate" ->
      """WITH sh AS (
           SELECT doc_id, lang,
             unnest(list_transform(
               range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
               i -> CASE
                 WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 3
                   THEN regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                        regexp_split_to_array(lower(trim(text)), '\s+')[i+2] || ' ' ||
                        regexp_split_to_array(lower(trim(text)), '\s+')[i+3]
                 WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) = 2
                   THEN regexp_split_to_array(lower(trim(text)), '\s+')[1] || ' ' ||
                        regexp_split_to_array(lower(trim(text)), '\s+')[2]
                 ELSE regexp_split_to_array(lower(trim(text)), '\s+')[1]
               END)) AS item
           FROM documents),
         bench AS (
           SELECT lang, item, count(*)::BIGINT AS cnt FROM sh
           WHERE doc_id % 32 = 2 OR doc_id % 32 = 18 GROUP BY lang, item),
         top AS (
           SELECT lang, item FROM (
             SELECT lang, item, row_number() OVER (PARTITION BY lang
               ORDER BY cnt DESC, item) AS rk FROM bench) t
           WHERE rk <= 20),
         contam AS (
           SELECT DISTINCT s.doc_id FROM sh s
           JOIN top t ON s.lang = t.lang AND s.item = t.item)
         SELECT d.lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_dropped
         FROM documents d LEFT JOIN contam c USING (doc_id)
         GROUP BY d.lang ORDER BY d.lang""",
    // q250: the decontamination composition mirrored exactly — the
    // store is in MG's exact regime at the fixture (no compression;
    // the wave split is invisible to additive counts), so the oracle
    // is plain exact SQL: benchmark shingle counts, tie-broken top-20
    // per lang, containment, per-lang keep/drop
    "q250_hh_decontaminate" ->
      """WITH sh AS (
           SELECT doc_id, lang,
             unnest(list_transform(
               range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
               i -> CASE
                 WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 3
                   THEN regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                        regexp_split_to_array(lower(trim(text)), '\s+')[i+2] || ' ' ||
                        regexp_split_to_array(lower(trim(text)), '\s+')[i+3]
                 WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) = 2
                   THEN regexp_split_to_array(lower(trim(text)), '\s+')[1] || ' ' ||
                        regexp_split_to_array(lower(trim(text)), '\s+')[2]
                 ELSE regexp_split_to_array(lower(trim(text)), '\s+')[1]
               END)) AS item
           FROM documents),
         bench AS (
           SELECT lang, item, count(*)::BIGINT AS cnt FROM sh
           WHERE doc_id % 97 = 0 GROUP BY lang, item),
         top AS (
           SELECT lang, item FROM (
             SELECT lang, item, row_number() OVER (PARTITION BY lang
               ORDER BY cnt DESC, item) AS rk FROM bench) t
           WHERE rk <= 20),
         contam AS (
           SELECT DISTINCT s.doc_id FROM sh s
           JOIN top t ON s.lang = t.lang AND s.item = t.item)
         SELECT d.lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_dropped
         FROM documents d LEFT JOIN contam c USING (doc_id)
         GROUP BY d.lang ORDER BY d.lang""",
    // q248: KLL guarantee bits (statistical-oracle policy — realized
    // rank error checked in-engine vs the exact recompute) + the
    // mirrored group count; n is exact by the KLL structure
    "q248_quantile_store" ->
      """SELECT * FROM (VALUES
           ('n_exact', 1),
           ('n_groups', (SELECT count(DISTINCT source) FROM documents)),
           ('rank_within_eps_p10', 1),
           ('rank_within_eps_p50', 1),
           ('rank_within_eps_p90', 1)) t(component, val)
         ORDER BY component""",
    // q249: the exact leg (per-group n) + the SQL≡DataFrame serve bit
    "q249_sql_quantile_serve" ->
      """SELECT source AS grp, count(*)::BIGINT AS n, 1 AS sql_eq_df
         FROM documents GROUP BY source ORDER BY grp""",
    // q213: constant-truth hierarchy bits (recall floors measured
    // in-engine vs exact; equalities exact by construction)
    "q213_nsw_hier" ->
      """SELECT * FROM (VALUES
           ('hier_append_eq_fresh_fit', 1),
           ('hier_eq_flat_at_exhaustive_ef', 1),
           ('mrr_self_exact', 1),
           ('recall10_floor_090', 1)) t(component, ok)
         ORDER BY component""",
    // q215: window-placement arithmetic replayed — n_chunks = 1 if
    // n <= w else 1 + ceil((n-w)/s); DuckDB 1-based inclusive list
    // slice toks[a:b] mirrors Spark's slice(toks, a, w). Shared
    // verbatim by q216 (the SQL-frontend face).
    "q215_chunk_sliding" -> chunkOracleSql,
    "q216_sql_chunk" -> chunkOracleSql,
    // q217: the telescoped NB score replayed — unseen (class, token)
    // pairs are the absent join rows (ln 1 = 0), OOV tokens shift all
    // classes equally through the n_d·ln(T_c+V) term; argmax by
    // rounded score DESC, label ASC (the engine orders by −score ASC
    // — identical on the 4dp grid)
    "q217_nb_domain" ->
      """WITH tr AS (
           SELECT source AS label,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents
           WHERE (doc_id % 1000003 * 2654435761) % 4294967296 % 100 < 90),
         ho AS (
           SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents
           WHERE (doc_id % 1000003 * 2654435761) % 4294967296 % 100 >= 90),
         ti AS (SELECT label, unnest(toks) AS token FROM tr),
         cc AS (SELECT label, token, count(*) AS cnt FROM ti GROUP BY label, token),
         bycls AS (
           SELECT label, count(*) AS n_c, CAST(sum(len(toks)) AS BIGINT) AS t_c
           FROM tr GROUP BY label),
         g AS (SELECT (SELECT count(DISTINCT token) FROM ti) AS v,
                      (SELECT count(*) FROM tr) AS n),
         cls AS (
           SELECT label, ln(CAST(n_c AS DOUBLE) / n) AS logprior,
             ln(CAST(t_c + v AS DOUBLE)) AS logden
           FROM bycls, g),
         hi AS (SELECT doc_id, unnest(toks) AS token FROM ho),
         hits AS (
           SELECT doc_id, label, sum(ln(cnt + 1)) AS hitsum
           FROM hi JOIN cc USING (token) GROUP BY doc_id, label),
         nd AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_d FROM ho),
         sc AS (
           SELECT nd.doc_id, nd.source, cls.label,
             round(logprior - n_d * logden + coalesce(hitsum, 0.0), 4) AS score
           FROM nd CROSS JOIN cls
           LEFT JOIN hits ON hits.doc_id = nd.doc_id AND hits.label = cls.label)
         SELECT doc_id, source, label AS pred, score FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, label) AS rn
           FROM sc) t
         WHERE rn = 1 ORDER BY doc_id""",
    // q218: constant-truth lifecycle bits — exact by the additivity
    // of counts (maintained ≡ fresh fit bit-for-bit)
    "q218_nb_store_lifecycle" ->
      """SELECT * FROM (VALUES
           ('class_eq_fresh_fit', 1),
           ('counts_eq_fresh_fit', 1),
           ('pred_eq_in_memory', 1),
           ('scores_eq_in_memory', 1)) t(component, ok)
         ORDER BY component""",
    // q219: constant-truth lifecycle bits — exact by the additivity
    // of n-gram counts
    "q219_lm_store_lifecycle" ->
      """SELECT * FROM (VALUES
           ('bi_eq_fresh_count', 1),
           ('bigram_serve_eq_in_memory', 1),
           ('scores_eq_in_memory', 1),
           ('tri_eq_fresh_count', 1),
           ('uni_eq_fresh_count', 1),
           ('unigram_serve_eq_in_memory', 1)) t(component, ok)
         ORDER BY component""",
    // q220: constant-truth streaming-maintenance bits
    "q220_nb_stream_maintain" ->
      """SELECT * FROM (VALUES
           ('class_eq_one_shot', 1),
           ('counts_eq_one_shot', 1),
           ('dup_delivery_skipped', 1),
           ('serve_eq_in_memory', 1)) t(component, ok)
         ORDER BY component""",
    // q221: all three stages replayed in one statement — the q212
    // difficulty/ntile/rank windows, the q215 window-placement
    // arithmetic, and the q91 greedy fold as a recursive CTE keyed by
    // the composite (rank·1000 + chunk) packing order
    "q221_dataloader_e2e" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         sc AS (
           SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
             CAST(length(array_to_string(t, '')) AS DOUBLE) / len(t) AS mean_wlen,
             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
           FROM toks),
         d AS (
           SELECT doc_id,
             round(0.5 * mean_wlen + 3.0 * (1.0 - ttr) + ln(1.0 + n_tok), 4)
               AS difficulty
           FROM sc),
         ph AS (
           SELECT doc_id, difficulty,
             ntile(4) OVER (ORDER BY difficulty, doc_id) AS phase
           FROM d),
         pr AS (
           SELECT doc_id, phase,
             row_number() OVER (PARTITION BY phase
               ORDER BY difficulty, doc_id) AS rank_in_phase
           FROM ph),
         c AS (
           SELECT doc_id, len(t) AS n,
             CASE WHEN len(t) <= 64 THEN 1
                  ELSE 1 + CAST(ceil((len(t) - 64) / 48.0) AS INT)
             END AS nc
           FROM toks),
         ch AS (
           SELECT doc_id, CAST(k AS INT) AS chunk_id,
             CAST(least(64, n - k * 48) AS BIGINT) AS tokens
           FROM (SELECT doc_id, n, unnest(range(nc)) AS k FROM c)),
         seq AS (
           SELECT pr.phase, pr.rank_in_phase * 1000 + ch.chunk_id AS ord,
             ch.doc_id, ch.chunk_id, ch.tokens,
             row_number() OVER (PARTITION BY pr.phase
               ORDER BY pr.rank_in_phase * 1000 + ch.chunk_id) AS rn
           FROM ch JOIN pr ON pr.doc_id = ch.doc_id),
         r AS (
           SELECT phase, doc_id, chunk_id, tokens, rn, tokens AS acc, 0 AS bin
           FROM seq WHERE rn = 1
           UNION ALL
           SELECT s.phase, s.doc_id, s.chunk_id, s.tokens, s.rn,
             CASE WHEN r.acc > 0 AND r.acc + s.tokens > 256
                  THEN s.tokens ELSE r.acc + s.tokens END,
             CASE WHEN r.acc > 0 AND r.acc + s.tokens > 256
                  THEN r.bin + 1 ELSE r.bin END
           FROM r JOIN seq s ON s.phase = r.phase AND s.rn = r.rn + 1)
         SELECT CAST(phase AS INT) AS phase, doc_id, chunk_id,
           tokens AS n_tokens, bin
         FROM r ORDER BY phase, doc_id, chunk_id""",
    // q222: PMI replayed — margins of the bigram event space (NOT
    // unigram token counts), double arithmetic before the products
    // (BIGINT c·T overflows at web scale), same (pmi DESC, pair)
    // total order on the rounded grid
    "q222_collocations" ->
      """WITH toks AS (
           SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         bi AS (
           SELECT unnest(list_transform(range(len(t) - 1), i -> t[i+1])) AS w1,
             unnest(list_transform(range(len(t) - 1), i -> t[i+2])) AS w2
           FROM toks WHERE len(t) >= 2),
         bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
         m1 AS (SELECT w1, sum(cb) AS c1 FROM bc GROUP BY w1),
         m2 AS (SELECT w2, sum(cb) AS c2 FROM bc GROUP BY w2),
         tot AS (SELECT CAST(sum(cb) AS BIGINT) AS t FROM bc),
         scored AS (
           SELECT w1, w2, cb,
             round(ln(CAST(cb AS DOUBLE) * t / (CAST(c1 AS DOUBLE) * c2)), 4)
               AS pmi
           FROM bc JOIN m1 USING (w1) JOIN m2 USING (w2), tot
           WHERE cb >= 5
           ORDER BY pmi DESC, w1, w2 LIMIT 50)
         SELECT w1, w2, cb, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank
         FROM scored ORDER BY rank""",
    // q223: the naive theta join IS the oracle — the binned engine
    // path must reproduce it exactly (end-exclusive, same-customer)
    "q223_range_join" ->
      """SELECT p.event_id AS purchase_id, e.event_id, e.user_id
         FROM events p JOIN events e
           ON e.user_id = p.user_id
          AND epoch_us(e.ts) >= epoch_us(p.ts)
          AND epoch_us(e.ts) < epoch_us(p.ts) + 3600000000
         WHERE p.event_type = 'purchase'
         ORDER BY purchase_id, e.event_id""",
    // q224: the naive overlap theta join IS the oracle
    "q224_interval_overlap" ->
      """WITH pu AS (
           SELECT user_id, event_id AS purchase_id,
             epoch_us(ts) AS s1, epoch_us(ts) + 3600000000 AS e1
           FROM events WHERE event_type = 'purchase'),
         cl AS (
           SELECT user_id, event_id AS click_id,
             epoch_us(ts) AS s2, epoch_us(ts) + 1800000000 AS e2
           FROM events WHERE event_type = 'click')
         SELECT pu.purchase_id, cl.click_id, pu.user_id
         FROM pu JOIN cl ON pu.user_id = cl.user_id
          AND pu.s1 < cl.e2 AND cl.s2 < pu.e1
         ORDER BY pu.purchase_id, cl.click_id""",
    // q225/q226: constant-truth SQL-face bits (catalog tables are
    // invisible to DuckDB; the equality is established in-engine)
    "q225_sql_nb_serve" ->
      """SELECT * FROM (VALUES
           ('sql_serve_eq_dataframe', 1)) t(component, ok)
         ORDER BY component""",
    "q226_sql_lm_serve" ->
      """SELECT * FROM (VALUES
           ('sql_serve_eq_dataframe', 1)) t(component, ok)
         ORDER BY component""",
    // q227: q101's batch arithmetic over the WHOLE corpus — the
    // maintained store must reproduce it despite never seeing more
    // than one wave plus the standing k×groups rows at a time
    "q227_sample_store" ->
      """SELECT lang, doc_id, rank FROM (
           SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY
             round(pow(((((doc_id % 2147483647) * 2654435761) % 2147483647)
                   * 2147483629
                   + ((doc_id % 2147483629) * 2246822519) % 2147483629 + 1)
                 / 4611686018427387904.0, 1.0 / n_chars), 6) DESC, doc_id) AS rank
           FROM documents) t
         WHERE rank <= 5 ORDER BY lang, rank""",
    // q228: the ORIGINAL (pre-rewrite) theta-join SQL — DuckDB plans
    // it its own way (IEJoin); the engine answers it through the
    // Catalyst rewrite. Hash match ⇒ the rewrite changed the plan and
    // nothing else.
    "q228_sql_range_rule" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS p
           FROM events),
         iv AS (
           SELECT event_id, p AS s0, p + 3600000000 AS e0
           FROM ev WHERE event_type = 'purchase' AND event_id % 97 = 0)
         SELECT iv.event_id AS purchase_id, e.event_id, e.user_id
         FROM iv JOIN ev e ON e.p >= iv.s0 AND e.p < iv.e0
         ORDER BY purchase_id, e.event_id, e.user_id""",
    // q230: q227's oracle VERBATIM — the maintained store, served by
    // catalog-table SQL, must reproduce the whole-corpus batch
    // arithmetic DuckDB computes from raw documents
    "q230_sql_sample_serve" ->
      """SELECT lang, doc_id, rank FROM (
           SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY
             round(pow(((((doc_id % 2147483647) * 2654435761) % 2147483647)
                   * 2147483629
                   + ((doc_id % 2147483629) * 2246822519) % 2147483629 + 1)
                 / 4611686018427387904.0, 1.0 / n_chars), 6) DESC, doc_id) AS rank
           FROM documents) t
         WHERE rank <= 5 ORDER BY lang, rank""",
    // q231: exact distinct counts are the cross-engine leg; the
    // sketch-vs-exact and maintained-vs-fresh claims are the
    // in-engine constant-truth bits (DuckDB's own HLL is a different
    // implementation, so only the EXACT counts can hash-match)
    "q231_hll_store" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
           1 AS ok_rel, 1 AS ok_near_fresh
         FROM events GROUP BY event_type ORDER BY event_type""",
    // q232: same hybrid shape as q231, with the SQL-served estimate
    // on the sketch legs
    "q232_sql_sketch_serve" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
           1 AS ok_rel, 1 AS ok_sql_eq_df
         FROM events GROUP BY event_type ORDER BY event_type""",
    // q234: one UNION ALL leg per profiled column — DuckDB's VARCHAR
    // comparison is byte-ordered like Spark's UTF8String, so string
    // min/max hash-match too
    "q234_profile" ->
      """WITH p AS (
           SELECT 'doc_id' AS col_name, COUNT(*) AS n,
             COUNT(*) - COUNT(doc_id) AS n_null,
             COUNT(DISTINCT doc_id) AS n_distinct,
             CAST(MIN(doc_id) AS VARCHAR) AS min_s,
             CAST(MAX(doc_id) AS VARCHAR) AS max_s FROM documents
           UNION ALL
           SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
             COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR),
             CAST(MAX(lang) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
             COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR),
             CAST(MAX(n_chars) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
             COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR),
             CAST(MAX(source) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'text', COUNT(*), COUNT(*) - COUNT(text),
             COUNT(DISTINCT text), CAST(MIN(text) AS VARCHAR),
             CAST(MAX(text) AS VARCHAR) FROM documents)
         SELECT * FROM p ORDER BY col_name""",
    // q240: the exact columns of the q234 report + the literal-1
    // mirror of the in-engine approx-within-5% bit
    "q240_approx_profile" ->
      """WITH p AS (
           SELECT 'doc_id' AS col_name, COUNT(*) AS n,
             COUNT(*) - COUNT(doc_id) AS n_null,
             COUNT(DISTINCT doc_id) AS n_distinct,
             CAST(MIN(doc_id) AS VARCHAR) AS min_s,
             CAST(MAX(doc_id) AS VARCHAR) AS max_s FROM documents
           UNION ALL
           SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
             COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR),
             CAST(MAX(lang) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
             COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR),
             CAST(MAX(n_chars) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
             COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR),
             CAST(MAX(source) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'text', COUNT(*), COUNT(*) - COUNT(text),
             COUNT(DISTINCT text), CAST(MIN(text) AS VARCHAR),
             CAST(MAX(text) AS VARCHAR) FROM documents)
         SELECT *, 1 AS ok_rel FROM p ORDER BY col_name""",
    // q253: the q240 exact legs over the four profiled columns; the
    // served quantiles are in-engine rank-window bits (randomized
    // KLL, the declared statistical-oracle policy)
    "q253_profile_quantiles" ->
      """WITH p AS (
           SELECT 'doc_id' AS col_name, COUNT(*) AS n,
             COUNT(*) - COUNT(doc_id) AS n_null,
             COUNT(DISTINCT doc_id) AS n_distinct,
             CAST(MIN(doc_id) AS VARCHAR) AS min_s,
             CAST(MAX(doc_id) AS VARCHAR) AS max_s FROM documents
           UNION ALL
           SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
             COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR),
             CAST(MAX(lang) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
             COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR),
             CAST(MAX(n_chars) AS VARCHAR) FROM documents
           UNION ALL
           SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
             COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR),
             CAST(MAX(source) AS VARCHAR) FROM documents)
         SELECT *, 1 AS q_rank_ok FROM p ORDER BY col_name""",
    // q236: the original NOT EXISTS SQL, evaluated DuckDB's own way
    "q236_sql_range_anti" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS p
           FROM events),
         iv AS (
           SELECT p AS s0, p + 3600000000 AS e0
           FROM ev WHERE event_type = 'purchase' AND event_id % 97 = 0)
         SELECT e.event_id, e.user_id FROM ev e
         WHERE NOT EXISTS (
           SELECT 1 FROM iv WHERE e.p >= iv.s0 AND e.p < iv.e0)
         ORDER BY event_id""",
    // q235: three bucketings + the stride-3 cascade, shift-for-shift
    // (q242, the zvalue3 SQL face, shares it verbatim)
    "q235_zorder3_curve" -> oracleSqlShared235,
    // q229: the Morton dilation replayed shift-for-shift (integer
    // floor-div buckets are exact here: every product < 2^53, so
    // Spark's floor(double) and DuckDB's // agree bit-for-bit);
    // q241 (the zvalue2 SQL face) shares it verbatim — one truth,
    // two engine-side surfaces
    "q229_zorder_curve" -> zorder2OracleSql,
    "q241_sql_zorder" -> zorder2OracleSql,
    // q242/q244: the zvalue3 SQL face and the 3-D Hilbert curve
    "q242_sql_zorder3" -> oracleSqlShared235,
    "q244_hilbert3_curve" -> hilbert3OracleSql(10),
    // q254: the writer face round-trips the same curve — q244's
    // generated oracle VERBATIM
    "q254_hilbert3_write" -> hilbert3OracleSql(10),
    // q243: the hilbert_d SQL face shares q233's generated oracle
    "q243_sql_hilbert" -> hilbertOracleSql(16),
    // q214: term-for-term replay of trigramStupidBackoff — raw
    // relative frequencies, left-associated (α·c)/denom arithmetic
    // (α² via 0.4*0.4 so both engines fold the same double), CASE
    // tiers in the engine's order. / on integers is float division
    // in both engines; the train/holdout split is the q49 hash.
    "q214_trigram_backoff" ->
      """WITH tr AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents
           WHERE (doc_id % 1000003 * 2654435761) % 4294967296 % 100 < 90),
         ho AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents
           WHERE (doc_id % 1000003 * 2654435761) % 4294967296 % 100 >= 90),
         occ AS (
           SELECT doc_id,
             unnest(list_transform(range(len(toks) - 2), i -> toks[i+1])) AS p1,
             unnest(list_transform(range(len(toks) - 2), i -> toks[i+2])) AS p2,
             unnest(list_transform(range(len(toks) - 2), i -> toks[i+3])) AS cur
           FROM ho WHERE len(toks) >= 3),
         tg AS (
           SELECT
             unnest(list_transform(range(len(toks) - 2), i -> toks[i+1])) AS p1,
             unnest(list_transform(range(len(toks) - 2), i -> toks[i+2])) AS p2,
             unnest(list_transform(range(len(toks) - 2), i -> toks[i+3])) AS cur
           FROM tr WHERE len(toks) >= 3),
         tc AS (SELECT p1, p2, cur, count(*) AS c3 FROM tg GROUP BY p1, p2, cur),
         bgi AS (
           SELECT
             unnest(list_transform(range(len(toks) - 1), i -> toks[i+1])) AS prev,
             unnest(list_transform(range(len(toks) - 1), i -> toks[i+2])) AS cur
           FROM tr WHERE len(toks) >= 2),
         bc AS (SELECT prev, cur, count(*) AS cb FROM bgi GROUP BY prev, cur),
         uct AS (SELECT unnest(toks) AS token FROM tr),
         uc AS (SELECT token, count(*) AS cu FROM uct GROUP BY token),
         tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total FROM uc)
         SELECT occ.doc_id, count(*) AS n_trigrams,
           round(avg(CASE WHEN c3 IS NOT NULL THEN 1 ELSE 0 END), 4) AS tri_frac,
           round(avg(ln(
             CASE WHEN c3 IS NOT NULL THEN c3 / b12.cb
                  WHEN b23.cb IS NOT NULL THEN 0.4::DOUBLE * b23.cb / u2.cu
                  ELSE 0.4::DOUBLE * 0.4::DOUBLE * u3.cu / tot.total
             END)), 4) AS logprob_avg
         FROM occ
         LEFT JOIN tc USING (p1, p2, cur)
         LEFT JOIN bc b12 ON b12.prev = occ.p1 AND b12.cur = occ.p2
         LEFT JOIN bc b23 ON b23.prev = occ.p2 AND b23.cur = occ.cur
         LEFT JOIN uc u2 ON u2.token = occ.p2
         JOIN uc u3 ON u3.token = occ.cur, tot
         GROUP BY occ.doc_id ORDER BY doc_id""",
    // q209: constant-truth serve-parity bits (exact by construction —
    // deterministic serve over equal rows, drain-fallback exactness
    // at ef ≥ shard size)
    "q209_nsw_store_serve" ->
      """SELECT * FROM (VALUES
           ('multi_entry_eq_at_exhaustive_ef', 1),
           ('store_params_roundtrip', 1),
           ('store_serve_eq_model', 1)) t(component, ok)
         ORDER BY component""",
    // q203: brute replay — the segment banding is pigeonhole-EXACT at
    // ed <= 2, so the oracle's all-pairs form must match row for row
    // (same sub-3-char prefix exclusion as the engine's contract)
    "q203_edit_neardup" ->
      """WITH jit AS (
           SELECT doc_id + 100000 AS doc_id,
             substr(text, 1, 2) || 'x' || substr(text, 4, 7) || 'q' ||
               substr(text, 12) AS text
           FROM documents WHERE doc_id % 10 = 0
           UNION ALL
           SELECT doc_id + 100000 AS doc_id,
             substr(text, 1, 6) || substr(text, 8) AS text
           FROM documents WHERE doc_id % 10 = 5),
         c AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id, text FROM jit),
         p AS (SELECT doc_id, lower(substr(text, 1, 60)) AS t
               FROM c WHERE length(substr(text, 1, 60)) >= 3)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.t, b.t) AS INT) AS dist
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE abs(length(a.t) - length(b.t)) <= 2
           AND levenshtein(a.t, b.t) <= 2
         ORDER BY id_a, id_b""",
    // q202: same CRT-paired multiplicative keys (two 31-bit-prime
    // rounds, combined k1*p2 + k2 — injective per epoch, every
    // product < 2^63 so DuckDB's BIGINT computes it exactly), real
    // per-epoch row_number windows
    "q202_epoch_schedule" -> epochScheduleOracleSql,
    // q211: the SAME oracle string, verbatim — the epoch schedule's
    // SQL face (epoch_key + real windows) against one truth
    "q211_sql_epoch" -> epochScheduleOracleSql,
    // q207: q200's difficulty and ntile phase, then the two nested
    // grouped ranks as REAL windows against the engine's offset form
    "q207_curriculum_interleave" -> interleaveOracleSql,
    // q212: the SAME oracle string, verbatim — the interleaved
    // curriculum's SQL face against one truth
    "q212_sql_interleave" -> interleaveOracleSql,
    // q201: the same synthesized page through the same three line
    // rules (separator, token floor, stopword density), lambda for
    // lambda against the engine's HOF chain
    "q201_boilerplate" ->
      """WITH pg AS (
           SELECT doc_id,
             'Home | About | Contact | Login' || chr(10) ||
             'Search' || chr(10) ||
             regexp_replace(text, ' and ', ' and' || chr(10), 'g') || chr(10) ||
             'Share on social media' || chr(10) ||
             'Copyright 2026 Example Corp. All rights reserved.' || chr(10) ||
             'Privacy Policy | Terms of Service' AS page
           FROM documents),
         ln AS (
           SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg),
         kept AS (
           SELECT doc_id, len(lines) AS total_lines,
             list_filter(lines, l ->
               NOT contains(l, ' | ')
               AND len(regexp_split_to_array(lower(trim(l)), '\s+')) >= 5
               AND CAST(len(list_filter(
                     regexp_split_to_array(lower(trim(l)), '\s+'),
                     w -> list_contains(['the','a','an','and','or','of','to',
                       'in','is','it','that','for','on','with','as','at','by',
                       'be','this'], w))) AS DOUBLE)
                   / len(regexp_split_to_array(lower(trim(l)), '\s+')) >= 0.15)
               AS kl
           FROM ln)
         SELECT doc_id, CAST(total_lines AS INT) AS total_lines,
           CAST(len(kl) AS INT) AS kept_lines,
           CAST(length(COALESCE(array_to_string(kl, chr(10)), '')) AS INT)
             AS n_chars_clean,
           COALESCE(array_to_string(kl, chr(10)), '') AS clean
         FROM kept ORDER BY doc_id""",
    // q192: every dim's top-k replayed with list_slice + cosine +
    // (c DESC, id) row_number; overlap via LEFT join so a
    // zero-overlap dim still reports 0
    "q192_matryoshka_overlap" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         dims AS (SELECT unnest([16, 32, 64]) AS dim),
         sc AS (
           SELECT d.dim, q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(list_slice(e.v, 1, d.dim),
               list_slice(q.qv, 1, d.dim)) AS c
           FROM e CROSS JOIN q CROSS JOIN dims d),
         tk AS (
           SELECT dim, query_id, neighbor_id,
             row_number() OVER (PARTITION BY dim, query_id
               ORDER BY c DESC, neighbor_id) AS rk
           FROM sc),
         kk AS (SELECT dim, query_id, neighbor_id FROM tk WHERE rk <= 10),
         fl AS (SELECT query_id, neighbor_id FROM kk WHERE dim = 64)
         SELECT k.dim, k.query_id,
           coalesce(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 END), 0)::BIGINT
             AS overlap
         FROM kk k LEFT JOIN fl f
           ON k.query_id = f.query_id AND k.neighbor_id = f.neighbor_id
         WHERE k.dim <> 64
         GROUP BY k.dim, k.query_id
         ORDER BY k.dim, k.query_id""",
    // q191: the oracle replays the closed-form waterfill — same bind
    // order (cap/p asc, source tiebreak), same exact-integer capped
    // predicate over exclusive prefix sums, same floor division for
    // the uncapped draws. Aggregates cast to BIGINT (DuckDB sums to
    // HUGEINT, which pandas mangles).
    "q191_mixture_waterfill" ->
      """WITH toks AS (
           SELECT source, 1 + length(source) % 3 AS p,
             sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))::BIGINT AS toks
           FROM documents GROUP BY source),
         caps AS (SELECT source, p, 4 * toks AS cap FROM toks),
         tot AS (SELECT sum(p)::BIGINT AS pp,
                   ((7 * sum(toks)::BIGINT) // 2)::BIGINT AS b FROM toks),
         f AS (
           SELECT c.source, c.p, c.cap, t.pp, t.b,
             coalesce(sum(c.cap) OVER w, 0)::BIGINT AS cumcap,
             coalesce(sum(c.p) OVER w, 0)::BIGINT AS cump
           FROM caps c, tot t
           WINDOW w AS (ORDER BY c.cap::DOUBLE / c.p, c.source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         g AS (SELECT *, (cap * (pp - cump) < p * (b - cumcap)) AS capped FROM f),
         ca AS (
           SELECT coalesce(sum(CASE WHEN capped THEN cap END), 0)::BIGINT AS c,
             coalesce(sum(CASE WHEN capped THEN p END), 0)::BIGINT AS pc
           FROM g)
         SELECT g.source, g.p, g.cap, g.capped,
           (CASE WHEN g.capped THEN g.cap
             ELSE (g.p * (g.b - ca.c)) // (g.pp - ca.pc) END)::BIGINT AS alloc,
           round((CASE WHEN g.capped THEN g.cap
             ELSE (g.p * (g.b - ca.c)) // (g.pp - ca.pc) END)::DOUBLE / g.b, 6) AS share
         FROM g, ca ORDER BY g.source""",
    // q190: the oracle recomputes the sign bits with a list lambda
    // (bit ⇔ element < 0 — the SignPack convention), so the Hamming
    // scan, the top-c candidate cut (ham, id tiebreak), and the
    // exact-cosine rerank are ALL replayed, not just the final ranks.
    "q190_bq_rerank" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         ham AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             len(list_filter(range(1, len(e.v) + 1),
                 i -> (e.v[i] < 0) <> (q.qv[i] < 0))) AS ham,
             list_cosine_similarity(e.v, q.qv) AS c
           FROM e CROSS JOIN q),
         cand AS (
           SELECT query_id, neighbor_id, ham, c,
             row_number() OVER (PARTITION BY query_id
               ORDER BY ham, neighbor_id) AS hrk
           FROM ham),
         rer AS (
           SELECT query_id, neighbor_id, ham, c,
             row_number() OVER (PARTITION BY query_id
               ORDER BY c DESC, neighbor_id) AS rank
           FROM cand WHERE hrk <= 50)
         SELECT query_id, rank, neighbor_id, ham, round(c, 4) AS cos
         FROM rer WHERE rank <= 10 ORDER BY query_id, rank""",
    // q189: the same synthesized markup put through the same strip
    // chain, operation for operation (RE2-safe patterns, &amp; last)
    "q189_html_extract" ->
      """WITH h AS (
           SELECT doc_id,
             '<div class="doc"><!-- c --><p>' ||
             regexp_replace(text, ' the ', ' <b>the</b> ', 'g') ||
             '</p><script>var x = 1 < 2;</script><style>p { color: red }</style>&amp;amp; &lt;tail&gt;</div>'
               AS t
           FROM documents),
         s AS (
           SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
               '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '(?s)</?[A-Za-z][^>]*>', ' ', 'g'),
               '(?s)<![A-Za-z][^>]*>', ' ', 'g') AS t
           FROM h),
         d AS (
           SELECT doc_id,
             replace(replace(replace(replace(replace(replace(replace(t,
               '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', ''''), '&apos;', ''''),
               '&amp;', '&') AS t
           FROM s)
         SELECT doc_id,
           trim(regexp_replace(t, '\s+', ' ', 'g')) AS clean,
           length(trim(regexp_replace(t, '\s+', ' ', 'g'))) AS n_chars_clean
         FROM d ORDER BY doc_id""",
    // q188: the corruption replayed over the q119 CTE — same Knuth
    // arithmetic, same merge-by-predecessor span heads
    "q188_span_corruption" ->
      s"""WITH ids AS (${BpeAssets.tokenIdsOracleSql}),
          h AS (
            SELECT doc_id, pos, token_id,
              ((doc_id % 999983) * 127 + pos) % 1000003 * 2654435761
                % 4294967296 AS hh
            FROM ids),
          starts AS (
            SELECT doc_id, pos, 2 + hh % 3 AS len FROM h WHERE hh % 100 < 5),
          cover AS (
            SELECT DISTINCT doc_id, pos + unnest(range(0, len)) AS mpos
            FROM starts),
          masked AS (
            SELECT i.doc_id, i.pos FROM ids i
            JOIN cover c ON c.doc_id = i.doc_id AND c.mpos = i.pos),
          heads AS (
            SELECT m.doc_id, m.pos FROM masked m
            LEFT JOIN masked m2
              ON m2.doc_id = m.doc_id AND m2.pos = m.pos - 1
            WHERE m2.pos IS NULL),
          kept AS (
            SELECT i.doc_id, sum((i.pos + 1) * i.token_id) AS kept_checksum
            FROM ids i LEFT JOIN masked m
              ON m.doc_id = i.doc_id AND m.pos = i.pos
            WHERE m.pos IS NULL GROUP BY i.doc_id)
          SELECT t.doc_id, t.n_tokens,
            CAST(coalesce(km.n_masked, 0) AS BIGINT) AS n_masked,
            CAST(coalesce(hs.n_spans, 0) AS BIGINT) AS n_spans,
            CAST(coalesce(kept.kept_checksum, 0) AS BIGINT) AS kept_checksum
          FROM (SELECT doc_id, count(*) AS n_tokens FROM ids GROUP BY doc_id) t
          LEFT JOIN (SELECT doc_id, count(*) AS n_masked FROM masked
                     GROUP BY doc_id) km USING (doc_id)
          LEFT JOIN (SELECT doc_id, count(*) AS n_spans FROM heads
                     GROUP BY doc_id) hs USING (doc_id)
          LEFT JOIN kept USING (doc_id)
          ORDER BY doc_id""",
    // q186: the fertility report regrouped from the same generated
    // CTEs that gate the token streams themselves
    "q186_tokenizer_fertility" ->
      s"""WITH bpe AS (${BpeAssets.tokenIdsOracleSql}),
          mm AS (${PieceAssets.maxMatchOracleSql}),
          base AS (
            SELECT doc_id, lang,
              len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                w -> w <> '')) AS n_words,
              length(regexp_replace(trim(lower(text)), '\\s+', '', 'g'))
                AS n_sq_chars
            FROM documents),
          bt AS (SELECT doc_id, count(*) AS n_toks FROM bpe GROUP BY doc_id),
          mt AS (SELECT doc_id, count(*) AS n_toks FROM mm GROUP BY doc_id)
          SELECT 'bpe' AS form, lang, count(*) AS n_docs,
            round(sum(n_toks)::DOUBLE / sum(n_words), 6) AS tokens_per_word,
            round(sum(n_sq_chars)::DOUBLE / sum(n_toks), 6) AS chars_per_token
          FROM base JOIN bt USING (doc_id) GROUP BY lang
          UNION ALL
          SELECT 'maxmatch', lang, count(*),
            round(sum(n_toks)::DOUBLE / sum(n_words), 6),
            round(sum(n_sq_chars)::DOUBLE / sum(n_toks), 6)
          FROM base JOIN mt USING (doc_id) GROUP BY lang
          ORDER BY form, lang""",
    // q182: same truth as q170 — ORC roundtrip must reproduce the
    // parquet original value for value
    "q182_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    // q183: the manifest recomputed from the source table — counts,
    // payload chars, and the order-insensitive id checksum per shard
    "q183_shard_manifest" ->
      """SELECT (doc_id % 1000003 * 2654435761) % 4294967296 % 16 AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum((doc_id % 1000003) * 2654435761 % 4294967296) AS BIGINT)
             AS id_checksum
         FROM documents GROUP BY shard ORDER BY shard""",
    // q185: the refreshed corpus recomputed in SQL — edits bump
    // n_chars, deletes drop, adds join; manifest per shard
    "q185_shard_refresh" ->
      """SELECT (doc_id % 1000003 * 2654435761) % 4294967296 % 16 AS shard,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id % 5 <> 4 AND doc_id % 7 = 0
             THEN n_chars + 3 ELSE n_chars END) AS BIGINT) AS total_chars,
           CAST(sum((doc_id % 1000003) * 2654435761 % 4294967296) AS BIGINT)
             AS id_checksum
         FROM documents
         WHERE NOT (doc_id % 5 <> 4 AND doc_id % 11 = 3 AND doc_id % 7 <> 0)
         GROUP BY shard ORDER BY shard""",
    // q178: same truth as q78 — the SQL face serves the identical
    // score from the standing tables
    "q178_sql_bm25" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id = 0),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
         GROUP BY tf.doc_id ORDER BY doc_id""",
    // q177: the phrase table zips per-query offsets; occurrence =
    // every offset of THAT query witnessed at one (doc, start)
    "q177_phrase_batch" ->
      """WITH live AS (SELECT * FROM documents WHERE doc_id % 7 <> 3),
         arr AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
           FROM live),
         pos AS (
           SELECT doc_id, unnest(range(len(a))) AS pos, unnest(a) AS token
           FROM arr),
         dl AS (SELECT doc_id, len(a) AS dl FROM arr),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         ph AS (
           SELECT doc_id AS query_id,
             unnest(range(CASE WHEN doc_id = 2 THEN 3 ELSE 2 END)) AS off,
             unnest(a[1:(CASE WHEN doc_id = 2 THEN 3 ELSE 2 END)]) AS term
           FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
                 FROM documents WHERE doc_id IN (0, 1, 2))),
         mlen AS (SELECT query_id, count(DISTINCT off) AS m FROM ph GROUP BY query_id),
         hits AS (
           SELECT query_id, doc_id, pos - off AS start
           FROM pos JOIN ph ON token = term JOIN mlen USING (query_id)
           GROUP BY query_id, doc_id, pos - off
           HAVING count(DISTINCT off) = min(m)),
         tf AS (
           SELECT query_id, doc_id, count(*) AS phrase_tf
           FROM hits GROUP BY query_id, doc_id),
         dfq AS (SELECT query_id, count(*) AS df FROM tf GROUP BY query_id)
         SELECT tf.query_id, tf.doc_id, phrase_tf,
           round(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (phrase_tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (phrase_tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl)), 4) AS bm25
         FROM tf JOIN dfq USING (query_id) JOIN dl USING (doc_id), stats
         ORDER BY query_id, doc_id""",
    // q176: champion selection on BUILD-TIME (full-corpus) weights,
    // rescore on the live corpus — two stat sets, exactly the standing
    // tier's lifecycle
    "q176_champions_batch" ->
      """WITH q AS (
           SELECT DISTINCT doc_id AS query_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id IN (0, 2, 4)),
         allterms AS (SELECT DISTINCT term FROM q),
         toksF AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         dlF AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM documents),
         statsF AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dlF),
         tfF AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toksF JOIN allterms ON token = term GROUP BY doc_id, token),
         idfF AS (SELECT term, count(*) AS df FROM tfF GROUP BY term),
         wtF AS (
           SELECT doc_id, term,
             ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl)) AS w
           FROM tfF JOIN idfF USING (term) JOIN dlF USING (doc_id), statsF),
         champ AS (
           SELECT term, doc_id FROM (
             SELECT term, doc_id,
               row_number() OVER (PARTITION BY term
                 ORDER BY round(w, 4) DESC, doc_id) AS rn
             FROM wtF) t WHERE rn <= 32),
         cand AS (
           SELECT DISTINCT query_id, doc_id FROM champ JOIN q USING (term)),
         live AS (SELECT * FROM documents WHERE doc_id % 10 <> 1),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM live),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM live),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN allterms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         scored AS (
           SELECT q.query_id, tf.doc_id, count(*) AS n_matched,
             round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
               / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                   + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
           FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) JOIN q USING (term), stats
           GROUP BY q.query_id, tf.doc_id),
         ranked AS (
           SELECT s.query_id, s.doc_id, s.n_matched, s.bm25,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY s.bm25 DESC, s.doc_id) AS rank
           FROM scored s JOIN cand USING (query_id, doc_id))
         SELECT query_id, doc_id, n_matched, bm25, rank
         FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""",
    // q172: seeded-geometry lifecycle invariants recomputed in-engine
    // (q121's oracle pattern — constant truth)
    "q172_ivf_lifecycle" ->
      """SELECT * FROM (VALUES
           ('ivf_maintained_eq_rebuilt', 1), ('ivf_recall_ok', 1),
           ('ivf_serve_eq_compacted', 1), ('ivf_store_ids_live', 1),
           ('ivf_tombstones_purged', 1),
           ('pq_maintained_eq_rebuilt', 1), ('pq_recall_ok', 1),
           ('pq_serve_eq_compacted', 1)) t(component, ok)
         ORDER BY component""",
    // q171: the deterministic halves are plain counts over q87's
    // admitted CTE (edits = admitted ≡1 mod 10, takedowns = ≡2, final
    // store = admitted minus takedowns); the seeded-geometry halves
    // are in-engine constant-truth bits (q83/q168 pattern)
    "q171_gated_ann" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         rej AS (
           SELECT DISTINCT b.doc_id
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         adm AS (
           SELECT doc_id FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM rej))
         SELECT * FROM (VALUES
           ('ann_recall_ok', 1),
           ('ivf_ids_eq_index', 1),
           ('ivf_store_eq_rebuilt', 1),
           ('n_edited', (SELECT count(*) FROM adm WHERE doc_id % 10 = 1)),
           ('n_removed', (SELECT count(*) FROM adm WHERE doc_id % 10 = 2)),
           ('n_store', (SELECT count(*) FROM adm WHERE doc_id % 10 <> 2)),
           ('store_ids_eq_index', 1),
           ('store_vecs_bit_exact', 1)) t(component, val)
         ORDER BY component""",
    "q88_cluster_keep_best" ->
      """WITH RECURSIVE s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         pair AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM pair
               UNION SELECT id_b, id_a FROM pair),
         reach AS (
           SELECT DISTINCT src AS node, src AS r FROM e
           UNION
           SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src),
         comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
         q AS (SELECT doc_id,
                 len(regexp_split_to_array(lower(trim(text)), '\s+')) AS quality
               FROM documents),
         ranked AS (
           SELECT node, row_number() OVER (
             PARTITION BY cluster ORDER BY quality DESC, node ASC) AS rn
           FROM comp JOIN q ON node = doc_id)
         SELECT q.doc_id, q.quality FROM q
         WHERE q.doc_id IN (SELECT node FROM ranked WHERE rn = 1)
            OR q.doc_id NOT IN (SELECT node FROM comp)
         ORDER BY doc_id""",
    "q94_quality_floor" ->
      """WITH thr AS (
           SELECT lang, quantile_cont(n_chars, 0.3) AS t
           FROM documents GROUP BY lang)
         SELECT doc_id, documents.lang, n_chars
         FROM documents JOIN thr ON documents.lang = thr.lang
         WHERE n_chars >= t
         ORDER BY doc_id""",
    "q93_vec_ingest_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         rej AS (
           SELECT DISTINCT b.vec_id
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
         SELECT e.vec_id FROM e
         WHERE e.vec_id NOT IN (SELECT vec_id FROM rej)
         ORDER BY vec_id""",
    "q92_bm25_indexed_batch" ->
      """WITH live AS (SELECT * FROM documents WHERE doc_id % 10 <> 1),
         q AS (
           SELECT DISTINCT doc_id AS query_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM documents WHERE doc_id IN (0, 2, 4)),
         allterms AS (SELECT DISTINCT term FROM q),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM live),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM live),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN allterms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT q.query_id, tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) JOIN q USING (term), stats
         GROUP BY q.query_id, tf.doc_id ORDER BY query_id, doc_id""",
    "q91_sequence_packing" ->
      """WITH RECURSIVE t AS (
           SELECT source AS grp, doc_id AS id,
             len(regexp_split_to_array(lower(trim(text)), '\s+'))::BIGINT AS tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM documents),
         r AS (
           SELECT grp, id, tokens, rn, tokens AS acc, 0 AS bin
           FROM t WHERE rn = 1
           UNION ALL
           SELECT t.grp, t.id, t.tokens, t.rn,
             CASE WHEN r.acc > 0 AND r.acc + t.tokens > 256
                  THEN t.tokens ELSE r.acc + t.tokens END,
             CASE WHEN r.acc > 0 AND r.acc + t.tokens > 256
                  THEN r.bin + 1 ELSE r.bin END
           FROM r JOIN t ON t.grp = r.grp AND t.rn = r.rn + 1)
         SELECT grp, id AS doc_id, tokens, bin FROM r ORDER BY grp, doc_id""",
    "q90_codec_roundtrip" ->
      """WITH g AS (
           SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h FROM documents),
         px1 AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM g),
         px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM px1)
         SELECT doc_id, w AS width, h AS height,
           sum((doc_id*31 + x*7 + y*13) % 256)::BIGINT AS sum_r,
           sum((doc_id*17 + x*3 + y*5) % 256)::BIGINT AS sum_g,
           sum((doc_id*23 + x*11 + y*2) % 256)::BIGINT AS sum_b
         FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",
    // WAV oracle: replay the PCM16 sample formula (flat sample j of
    // clip id = ((id*31 + j*7919) % 65536) - 32768, channel = j %
    // channels) and aggregate the same exact-integer lanes the real
    // decode emits; mono clips carry 0 in the channel-1 lanes.
    "q120_wav_stats" ->
      """WITH base AS (
           SELECT doc_id, 1 + doc_id % 2 AS channels,
             8000 * (1 + doc_id % 3) AS rate, 64 + doc_id % 33 AS n_frames
           FROM documents),
         samp AS (
           SELECT doc_id, j % channels AS c,
             ((doc_id*31 + j*7919) % 65536) - 32768 AS s
           FROM (SELECT doc_id, channels, unnest(range(n_frames*channels)) AS j
                 FROM base)),
         agg AS (
           SELECT doc_id, c, max(abs(s))::BIGINT AS peak,
             sum(abs(s))::BIGINT AS sum_abs, sum(s*s)::BIGINT AS sum_sq
           FROM samp GROUP BY doc_id, c)
         SELECT b.doc_id AS media_id, b.rate AS sample_rate, b.channels,
           b.n_frames::BIGINT AS n_frames,
           (b.n_frames * 1000 // b.rate)::BIGINT AS duration_ms,
           a0.peak AS peak_0, a0.sum_abs AS sum_abs_0, a0.sum_sq AS sum_sq_0,
           coalesce(a1.peak, 0)::BIGINT AS peak_1,
           coalesce(a1.sum_abs, 0)::BIGINT AS sum_abs_1,
           coalesce(a1.sum_sq, 0)::BIGINT AS sum_sq_1
         FROM base b
         JOIN agg a0 ON a0.doc_id = b.doc_id AND a0.c = 0
         LEFT JOIN agg a1 ON a1.doc_id = b.doc_id AND a1.c = 1
         ORDER BY media_id""",
    // same PCM formula fanned across the three container labels: a
    // lossless container must not change a single integer lane
    "q161_audio_formats" ->
      """WITH base AS (
           SELECT doc_id, 1 + doc_id % 2 AS channels,
             8000 * (1 + doc_id % 3) AS rate, 64 + doc_id % 33 AS n_frames
           FROM documents),
         samp AS (
           SELECT doc_id, j % channels AS c,
             ((doc_id*31 + j*7919) % 65536) - 32768 AS s
           FROM (SELECT doc_id, channels, unnest(range(n_frames*channels)) AS j
                 FROM base)),
         agg AS (
           SELECT doc_id, c, max(abs(s))::BIGINT AS peak,
             sum(abs(s))::BIGINT AS sum_abs, sum(s*s)::BIGINT AS sum_sq
           FROM samp GROUP BY doc_id, c),
         fmt AS (SELECT unnest(['wav', 'aiff', 'au']) AS format)
         SELECT b.doc_id AS media_id, f.format, b.rate AS sample_rate,
           b.channels, b.n_frames::BIGINT AS n_frames,
           (b.n_frames * 1000 // b.rate)::BIGINT AS duration_ms,
           a0.peak AS peak_0, a0.sum_abs AS sum_abs_0, a0.sum_sq AS sum_sq_0,
           coalesce(a1.peak, 0)::BIGINT AS peak_1,
           coalesce(a1.sum_abs, 0)::BIGINT AS sum_abs_1,
           coalesce(a1.sum_sq, 0)::BIGINT AS sum_sq_1
         FROM base b CROSS JOIN fmt f
         JOIN agg a0 ON a0.doc_id = b.doc_id AND a0.c = 0
         LEFT JOIN agg a1 ON a1.doc_id = b.doc_id AND a1.c = 1
         ORDER BY media_id, format""",
    // GIF video oracle: replay the frame formula (gray of clip id,
    // frame t, pixel (x,y) = (id*31 + t*101 + x*7 + y*13) % 256 —
    // gray pixels decode to lum == palette index exactly, since
    // (299+587+114)v/1000 = v) and aggregate the same integer lanes
    // the real multi-frame decode emits.
    "q131_gif_video" ->
      """WITH g AS (
           SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
             2 + doc_id % 4 AS nf FROM documents),
         fr AS (SELECT doc_id, w, h, nf, unnest(range(nf)) AS t FROM g),
         px1 AS (SELECT doc_id, w, h, nf, t, unnest(range(w)) AS x FROM fr),
         px AS (SELECT doc_id, w, h, nf, t, x, unnest(range(h)) AS y FROM px1),
         v AS (SELECT doc_id, w, h, nf,
             (doc_id*31 + t*101 + x*7 + y*13) % 256 AS gray,
             CASE WHEN t > 0 THEN abs(
               (doc_id*31 + t*101 + x*7 + y*13) % 256
               - (doc_id*31 + (t-1)*101 + x*7 + y*13) % 256) ELSE 0 END AS delta
           FROM px)
         SELECT doc_id AS media_id, nf AS n_frames, w AS width, h AS height,
           sum(gray)::BIGINT AS sum_gray, sum(delta)::BIGINT AS motion
         FROM v GROUP BY doc_id, nf, w, h ORDER BY media_id""",
    // dup-span removal oracle: same segmentation (consecutive 8-token
    // windows over single-space tokens), keep = corpus-wide first
    // occurrence in (doc_id, seg_idx) order (the window formulation of
    // the engine's argmin agg), rebuild in segment order and md5.
    "q132_dup_span_removal" ->
      """WITH toks AS (
           SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents),
         segs AS (
           SELECT doc_id, i AS seg_idx,
             array_to_string(t[i*8+1 : i*8+8], ' ') AS seg,
             len(t[i*8+1 : i*8+8]) AS seg_toks
           FROM (SELECT doc_id, t,
                   unnest(range(CAST(ceil(len(t)/8.0) AS BIGINT))) AS i
                 FROM toks)),
         flagged AS (
           SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1 AS keep
           FROM segs)
         SELECT doc_id, count(*)::BIGINT AS n_seg,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           coalesce(sum(CASE WHEN keep THEN seg_toks END), 0)::BIGINT AS kept_tokens,
           md5(coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_idx), '')) AS kept_md5
         FROM flagged GROUP BY doc_id ORDER BY doc_id""",
    // incremental counter store serves EXACT counts: same oracle shape
    // as q128's exact path (full recount), which is the pinned
    // sum-of-deltas semantics
    "q133_freq_stream" ->
      """SELECT tok AS token, count(*)::BIGINT AS cnt FROM (
           SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
           FROM documents) u
         WHERE tok <> '' GROUP BY tok
         ORDER BY cnt DESC, tok LIMIT 20""",
    // sampled-frame oracle: frames t = 0, 2, 4, ... of the q131 clip
    // formula, per-frame gray sums
    "q134_gif_frame_sample" ->
      """WITH g AS (
           SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
             2 + doc_id % 4 AS nf FROM documents),
         fr AS (SELECT doc_id, w, h, unnest(range(nf)) AS t FROM g),
         sampled AS (SELECT * FROM fr WHERE t % 2 = 0),
         px1 AS (SELECT doc_id, w, h, t, unnest(range(w)) AS x FROM sampled),
         px AS (SELECT doc_id, w, h, t, x, unnest(range(h)) AS y FROM px1)
         SELECT doc_id AS media_id, t::INT AS frame_idx, w::INT AS width,
           h::INT AS height,
           sum((doc_id*31 + t*101 + x*7 + y*13) % 256)::BIGINT AS gray_sum
         FROM px GROUP BY doc_id, t, w, h ORDER BY media_id, frame_idx""",
    // token-budget mix oracle: the one-window formulation of the same
    // contract — keep while the hash-order running token total fits
    "q135_token_budget_mix" ->
      """WITH t AS (
           SELECT lang, doc_id,
             len(string_split(lower(trim(text)), ' '))::BIGINT AS tokens,
             (((doc_id % 2147483647) * 2654435761) % 2147483647) * 2147483629
               + ((doc_id % 2147483629) * 2246822519) % 2147483629 AS h
           FROM documents),
         b(lang, budget) AS (VALUES
           ('en', 5000), ('de', 1500), ('es', 2000), ('fr', 1000), ('zh', 2500)),
         c AS (
           SELECT t.lang, t.doc_id, t.tokens, b.budget,
             sum(t.tokens) OVER (PARTITION BY t.lang ORDER BY t.h, t.doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM t JOIN b ON b.lang = t.lang)
         SELECT lang, doc_id, tokens FROM c WHERE cum <= budget
         ORDER BY lang, doc_id""",
    // JSONL roundtrip oracle: the parquet original — the JSON
    // write+read must be bit-lossless to match
    "q136_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    // the CSV roundtrip must reproduce the parquet original exactly
    "q170_csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    // incremental drift oracle: batch b's reference = cumulative token
    // counts through batch b (per-token window cumsum); same separable
    // KL formula as q107, same 6dp aggregate rounding
    // exact-Jaccard pairs (the q30 truth) + q76's span stats + plain
    // distinct counts, rolled into one (metric, value) report
    "q158_dedup_dashboard" ->
      """WITH sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         pr AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         df AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
         perdoc AS (
           SELECT ex.doc_id,
             round(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*), 4) AS dup_ratio
           FROM ex JOIN df USING (s) GROUP BY ex.doc_id)
         SELECT metric, value FROM (
           SELECT 'n_docs' AS metric, count(*)::DOUBLE AS value FROM documents
           UNION ALL SELECT 'exact_dup_docs',
             (count(*) - count(DISTINCT text))::DOUBLE FROM documents
           UNION ALL SELECT 'neardup_pairs', count(*)::DOUBLE FROM pr
           UNION ALL SELECT 'docs_in_neardup', count(DISTINCT id)::DOUBLE
             FROM (SELECT id_a AS id FROM pr UNION ALL SELECT id_b FROM pr) u
           UNION ALL SELECT 'mean_dup_span_ratio', round(avg(dup_ratio), 6)
             FROM perdoc) m
         ORDER BY metric""",
    // q141's NB mirror rolled up to (label, pred) cells
    "q157_nb_confusion" ->
      """WITH base AS (
           SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text
           FROM documents),
         toks AS (
           SELECT doc_id, y,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
           FROM base),
         tk AS (SELECT * FROM toks WHERE tok <> ''),
         cnt AS (
           SELECT tok, sum(y)::BIGINT AS c1, sum(1 - y)::BIGINT AS c0
           FROM tk GROUP BY tok),
         tot AS (
           SELECT sum(c1)::BIGINT AS t1, sum(c0)::BIGINT AS t0,
             count(*)::BIGINT AS v
           FROM cnt),
         pri AS (SELECT sum(y)::BIGINT AS n1, sum(1 - y)::BIGINT AS n0 FROM base),
         dt AS (SELECT doc_id, tok, count(*)::BIGINT AS c_dt
           FROM tk GROUP BY doc_id, tok),
         parts AS (
           SELECT d.doc_id,
             sum(d.c_dt * ln((c.c1 + 1)::DOUBLE / (t.t1 + t.v))) AS p1,
             sum(d.c_dt * ln((c.c0 + 1)::DOUBLE / (t.t0 + t.v))) AS p0
           FROM dt d JOIN cnt c ON c.tok = d.tok, tot t
           GROUP BY d.doc_id),
         sc AS (
           SELECT b.doc_id, b.y,
             round(ln(n1::DOUBLE / (n1 + n0)) + coalesce(p.p1, 0.0), 6) AS s1,
             round(ln(n0::DOUBLE / (n1 + n0)) + coalesce(p.p0, 0.0), 6) AS s0
           FROM base b LEFT JOIN parts p ON p.doc_id = b.doc_id, pri)
         SELECT y AS label, CASE WHEN s1 > s0 THEN 1 ELSE 0 END AS pred,
           count(*)::BIGINT AS n
         FROM sc GROUP BY 1, 2 ORDER BY label, pred""",
    // q42's quality float path, conditionally summed per threshold
    "q156_quality_sweep" ->
      """WITH t AS (
           SELECT doc_id, text,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT len(toks) AS n_tokens,
             CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                 / length(text) END AS punct_ratio,
             CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], x)))::DOUBLE
                 / len(toks) END AS stopword_ratio
           FROM t),
         q AS (
           SELECT n_tokens,
             CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.4 AS DOUBLE)
               + CASE WHEN stopword_ratio >= 0.01 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE)
               + CASE WHEN punct_ratio <= 0.2 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE) AS qv
           FROM m)
         SELECT thr,
           sum(CASE WHEN qv >= thr THEN 1 ELSE 0 END)::BIGINT AS n_docs,
           sum(CASE WHEN qv >= thr THEN n_tokens ELSE 0 END)::BIGINT AS n_tokens
         FROM q, unnest([0.0, 0.3, 0.4, 0.6, 0.7, 1.0]) u(thr)
         GROUP BY thr ORDER BY thr""",
    // same pow/sum float path to the 6dp weight; targets floor over
    // exact DECIMAL arithmetic (partitioning-stable on integral
    // boundaries — the equal-group 499/500 flake)
    "q155_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         t AS (SELECT sum(pow(n, 0.7)) AS tp FROM c)
         SELECT source, n::BIGINT AS n_docs,
           round(pow(n, 0.7) / tp, 6) AS weight,
           floor(round(pow(n, 0.7) / tp, 6)::DECIMAL(18,6) * 10000)::BIGINT AS target
         FROM c, t ORDER BY source""",
    // q42's stopword-vote mirror, rolled up to (label, pred) cells
    "q154_lang_confusion" ->
      """WITH t AS (
           SELECT lang,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT lang,
             list_max([
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['der','die','und','in','den','von','zu','das','mit','sich','des','auf'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'de'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['the','and','of','to','in','is','that','it','for','with','was','on'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'en'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['el','la','de','que','y','en','los','del','se','las','por','un'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'es'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['le','la','de','et','les','des','en','un','du','une','que','est'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'fr'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['de','a','o','que','e','do','da','em','um','para','com','uma'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'pt')]) AS best
           FROM t)
         SELECT lang,
           CASE WHEN best.score > 0.0 THEN best.lang ELSE 'und' END AS pred,
           count(*)::BIGINT AS n
         FROM m GROUP BY 1, 2 ORDER BY lang, pred""",
    // same staged extraction: emails from raw, ips from email-redacted,
    // phones from ip-redacted — identical dialect-neutral patterns
    "q153_pii_audit" ->
      """WITH aug AS (
           SELECT doc_id,
             text || ' contact user' || doc_id || '@mail.example.com or +1 555 01'
               || lpad((doc_id % 100)::VARCHAR, 2, '0') || ' 3456 from 10.2.'
               || (doc_id % 256) || '.7' AS t
           FROM documents),
         st AS (
           SELECT doc_id, t,
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t1
           FROM aug),
         st2 AS (
           SELECT doc_id, t, t1,
             regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
               '<IP>', 'g') AS t2
           FROM st)
         SELECT doc_id, pii_type, hit FROM (
           SELECT doc_id, 'email' AS pii_type,
             unnest(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS hit
           FROM st2
           UNION ALL
           SELECT doc_id, 'ip',
             unnest(regexp_extract_all(t1,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
           FROM st2
           UNION ALL
           SELECT doc_id, 'phone',
             unnest(regexp_extract_all(t2, '\+?\d[\d ]{7,}\d'))
           FROM st2) u
         ORDER BY doc_id, pii_type, hit""",
    // quantile_cont list thresholds ≡ Spark's linear-interpolated
    // percentile array; same strict-< bucket comparison
    "q152_quantile_buckets" ->
      """WITH th AS (
           SELECT quantile_cont(n_chars,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS t
           FROM documents)
         SELECT doc_id, n_chars,
           (1 + len(list_filter(t, x -> x < n_chars::DOUBLE)))::INT AS bucket
         FROM documents, th ORDER BY doc_id""",
    // every stage mirrored from its gated primitive: q144's normalize
    // chain, token-count length floor, min-id dedup, q47's Knuth split
    "q151_pipeline_funnel" ->
      """WITH norm AS (
           SELECT doc_id,
             trim(regexp_replace(regexp_replace(regexp_replace(
               nfc_normalize(text),
               '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
               '[\x00-\x1F\x7F]', ' ', 'g'),
               '\s+', ' ', 'g')) AS ntext
           FROM documents),
         n2 AS (SELECT * FROM norm WHERE len(ntext) > 0),
         lf AS (
           SELECT * FROM n2
           WHERE len(regexp_split_to_array(lower(trim(ntext)), '\s+')) >= 10),
         dd AS (SELECT ntext, min(doc_id) AS doc_id FROM lf GROUP BY ntext),
         tr AS (
           SELECT * FROM dd
           WHERE ((((doc_id % 2147483647) * 2654435761) % 2147483647)
                  * 2147483629
                  + ((doc_id % 2147483629) * 2246822519) % 2147483629)
                 % 100 < 90),
         tok AS (SELECT 1 AS i, 'raw' AS stage, count(*) AS n_docs,
             coalesce(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))), 0)::BIGINT AS n_tokens
           FROM documents
           UNION ALL SELECT 2, 'normalized', count(*),
             coalesce(sum(len(regexp_split_to_array(lower(trim(ntext)), '\s+'))), 0)::BIGINT FROM n2
           UNION ALL SELECT 3, 'len_floor', count(*),
             coalesce(sum(len(regexp_split_to_array(lower(trim(ntext)), '\s+'))), 0)::BIGINT FROM lf
           UNION ALL SELECT 4, 'dedup', count(*),
             coalesce(sum(len(regexp_split_to_array(lower(trim(ntext)), '\s+'))), 0)::BIGINT FROM dd
           UNION ALL SELECT 5, 'train', count(*),
             coalesce(sum(len(regexp_split_to_array(lower(trim(ntext)), '\s+'))), 0)::BIGINT FROM tr)
         SELECT i AS stage_idx, stage, n_docs, n_tokens
         FROM tok ORDER BY stage_idx""",
    // store geometry from the drop arithmetic: first-seen-wins vector
    // dedup survivors of the old drop × 8 trees before; (old − gone +
    // fresh) × 8 after; clean/appeared are recounted truths
    "q150_vector_drop_sync" ->
      """WITH surv AS (
           SELECT min(vec_id) AS vid FROM embeddings
           WHERE vec_id % 7 <> 0 GROUP BY embedding),
         gone AS (
           -- removed: in old, not in new; changed: in both, vector revised
           SELECT vid FROM surv
           WHERE vid % 11 = 0 OR (vid % 11 <> 0 AND vid % 5 = 0)),
         fresh AS (
           -- added: in new, not in old; changed: revised vector re-added
           SELECT vec_id FROM embeddings
           WHERE vec_id % 11 <> 0
             AND (vec_id % 7 = 0 OR vec_id % 5 = 0))
         SELECT
           (SELECT count(*) FROM surv) * 8 AS n_before,
           ((SELECT count(*) FROM surv) - (SELECT count(*) FROM gone)
             + (SELECT count(*) FROM fresh)) * 8 AS n_after,
           1 AS clean, 1 AS appeared""",
    // same token counts, same integer bucket division, same rounding
    "q149_padding_curve" ->
      """WITH lens AS (
           SELECT len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok
           FROM documents),
         e AS (
           SELECT n_tok, w AS bucket_width,
             CASE WHEN w = 0 THEN 0 ELSE n_tok // w END AS bucket
           FROM lens, unnest([1, 8, 16, 32, 0]) t(w)),
         byb AS (
           SELECT bucket_width, bucket, max(n_tok) AS mx, sum(n_tok) AS s,
             count(*) AS c
           FROM e GROUP BY bucket_width, bucket)
         SELECT bucket_width, count(*)::BIGINT AS n_buckets,
           sum(s)::BIGINT AS real_tokens,
           sum(mx * c)::BIGINT AS padded_tokens,
           round(1.0 - sum(s)::DOUBLE / sum(mx * c), 6) AS waste
         FROM byb GROUP BY bucket_width ORDER BY bucket_width""",
    // exact sizes + join count; the sketch guarantees are constant
    // truths (q128's discipline)
    "q148_join_size" ->
      """SELECT
           (SELECT count(*) FROM lineitem)::BIGINT AS n_a,
           (SELECT count(*) FROM orders)::BIGINT AS n_b,
           (SELECT count(*) FROM lineitem l JOIN orders o
             ON o.o_orderkey = l.l_orderkey)::BIGINT AS exact_join_rows,
           1 AS never_under, 1 AS bound_ok""",
    // same per-key counts, quantile_cont ≡ Spark's linear-interpolated
    // percentile (the percentileFloor parity), same 6dp rounding
    "q147_skew_report" ->
      """WITH c AS (
           SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey)
         SELECT metric, value FROM (
           SELECT 'n_keys' AS metric, count(*)::DOUBLE AS value FROM c
           UNION ALL SELECT 'n_rows', sum(n)::DOUBLE FROM c
           UNION ALL SELECT 'max_key_rows', max(n)::DOUBLE FROM c
           UNION ALL SELECT 'mean_key_rows', round(avg(n), 6) FROM c
           UNION ALL SELECT 'p50_key_rows', round(quantile_cont(n, 0.5), 6) FROM c
           UNION ALL SELECT 'p90_key_rows', round(quantile_cont(n, 0.9), 6) FROM c
           UNION ALL SELECT 'p99_key_rows', round(quantile_cont(n, 0.99), 6) FROM c
           UNION ALL SELECT 'skew_ratio',
             round(max(n)::DOUBLE / round(avg(n), 6), 6) FROM c) t
         ORDER BY metric""",
    // fresh BM25 over the NEW drop, from scratch — the engine must
    // reach the same numbers through remove/compact/append
    "q146_incremental_index" ->
      """WITH nd AS (
           SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE doc_id % 11 <> 0),
         terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM nd WHERE doc_id = 1),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM nd),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM nd),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
         GROUP BY tf.doc_id ORDER BY doc_id""",
    // fresh BM25 over the FINAL live corpus after the scripted
    // add/change/delete waves — the engine reaches the same numbers
    // through the streaming maintenance loop's per-batch deltas
    "q160_stream_maintain" ->
      """WITH nd AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 AND doc_id % 5 = 0
                  THEN text || ' v2' ELSE text END AS text
           FROM documents
           WHERE NOT (doc_id % 3 = 0 AND doc_id % 7 = 0 AND doc_id % 5 <> 0)),
         terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:5]) AS term
           FROM nd WHERE doc_id = 1),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM nd),
         dl AS (
           SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
           FROM nd),
         stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, token AS term, count(*) AS tf
           FROM toks JOIN terms ON token = term GROUP BY doc_id, token),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id, count(*) AS n_matched,
           round(sum(ln(1.0::DOUBLE + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
             * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
             / (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
                 + 0.75::DOUBLE * dl / avgdl))), 4) AS bm25
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
         GROUP BY tf.doc_id ORDER BY doc_id""",
    // exact-Jaccard pairs (the q30 truth) symmetrized, same Knuth draw,
    // same cleanliness flag — one mirrored pipeline end to end
    "q145_contrastive_triplets" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents),
         pr AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         pos AS (
           SELECT id_a AS anchor_id, id_b AS pos_id FROM pr
           UNION ALL
           SELECT id_b, id_a FROM pr),
         mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
         drawn AS (
           SELECT anchor_id, pos_id,
             ((anchor_id % 1000003) * 2654435761
               + (pos_id % 999983) * 40503
               + 2246822519) % (SELECT n FROM mx) AS neg_id
           FROM pos)
         SELECT d.anchor_id, d.pos_id, d.neg_id,
           CASE WHEN d.neg_id = d.anchor_id THEN 0
                WHEN EXISTS (SELECT 1 FROM pos p
                  WHERE p.anchor_id = d.anchor_id AND p.pos_id = d.neg_id)
                  THEN 0
                ELSE 1 END AS neg_clean
         FROM drawn d JOIN (SELECT DISTINCT doc_id FROM documents) c
           ON c.doc_id = d.neg_id
         ORDER BY anchor_id, pos_id""",
    // same salt, same pass order: nfc_normalize, zero-width strip,
    // control→space, \s+ collapse, trim — byte-identical output.
    // length() counts codepoints in DuckDB and UTF-16 units in Spark —
    // identical here because every char in play is BMP.
    "q144_normalize_text" ->
      """WITH dirty AS (
           SELECT doc_id,
             text || ' caf' || chr(101) || chr(769) || chr(7) || 'x'
                  || chr(8203) || 'y  z' AS d
           FROM documents)
         SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
             nfc_normalize(d),
             '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
             '[\x00-\x1F\x7F]', ' ', 'g'),
             '\s+', ' ', 'g')) AS norm_text,
           length(d)::INT AS n_before,
           length(trim(regexp_replace(regexp_replace(regexp_replace(
             nfc_normalize(d),
             '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
             '[\x00-\x1F\x7F]', ' ', 'g'),
             '\s+', ' ', 'g')))::INT AS n_after
         FROM dirty ORDER BY doc_id""",
    // the four SQL-face curation functions mirrored from the q42
    // (quality/langid), q144 (normalize) and q153 (redaction chain)
    // oracle fragments — one query certifies the whole SQL frontend
    "q162_sql_curation" ->
      """WITH t AS (
           SELECT doc_id, text,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, text,
             len(toks) AS n_tokens,
             CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                 / length(text) END AS punct_ratio,
             CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], x)))::DOUBLE
                 / len(toks) END AS stopword_ratio,
             list_max([
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['der','die','und','in','den','von','zu','das','mit','sich','des','auf'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'de'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['the','and','of','to','in','is','that','it','for','with','was','on'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'en'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['el','la','de','que','y','en','los','del','se','las','por','un'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'es'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['le','la','de','et','les','des','en','un','du','une','que','est'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'fr'),
               struct_pack(score := len(list_filter(toks, x -> list_contains(
                 ['de','a','o','que','e','do','da','em','um','para','com','uma'], x)))::DOUBLE
                 / greatest(len(toks), 1), lang := 'pt')]) AS best
           FROM t)
         SELECT doc_id,
           CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.4 AS DOUBLE)
             + CASE WHEN stopword_ratio >= 0.01 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE)
             + CASE WHEN punct_ratio <= 0.2 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END * CAST(0.3 AS DOUBLE) AS quality,
           CASE WHEN best.score > 0.0 THEN best.lang ELSE 'und' END AS lang_pred,
           trim(regexp_replace(regexp_replace(regexp_replace(
             nfc_normalize(text),
             '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
             '[\x00-\x1F\x7F]', ' ', 'g'),
             '\s+', ' ', 'g')) AS norm_text,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d ]{7,}\d', '<PHONE>', 'g') AS redacted
         FROM m ORDER BY doc_id""",
    // the DSIR log-ratio replayed term for term: same tokenization,
    // same unigram+bigram features, same add-1 smoothing over the
    // joint vocab, same 6dp rounding of the per-doc sum
    "q163_dsir_select" ->
      """WITH rawd AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents WHERE lang <> 'es'),
         tgtd AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents WHERE lang = 'es'),
         rng AS (
           SELECT doc_id, unnest(toks) AS ng FROM rawd
           UNION ALL
           SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
             i -> toks[i+1] || ' ' || toks[i+2])) AS ng FROM rawd),
         tng AS (
           SELECT doc_id, unnest(toks) AS ng FROM tgtd
           UNION ALL
           SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
             i -> toks[i+1] || ' ' || toks[i+2])) AS ng FROM tgtd),
         cr AS (SELECT ng, count(*) AS n_r FROM rng GROUP BY ng),
         ct AS (SELECT ng, count(*) AS n_t FROM tng GROUP BY ng),
         vocab AS (
           SELECT coalesce(cr.ng, ct.ng) AS ng,
             coalesce(n_r, 0) AS n_r, coalesce(n_t, 0) AS n_t
           FROM cr FULL OUTER JOIN ct ON cr.ng = ct.ng),
         tot AS (SELECT sum(n_r) AS tot_r, sum(n_t) AS tot_t,
                        count(*) AS v FROM vocab),
         model AS (
           SELECT ng,
             ln((n_t + 1.0::DOUBLE) / (tot_t + 1.0::DOUBLE * v))
               - ln((n_r + 1.0::DOUBLE) / (tot_r + 1.0::DOUBLE * v)) AS lr
           FROM vocab, tot),
         dng AS (SELECT doc_id, ng, count(*) AS c FROM rng GROUP BY doc_id, ng)
         SELECT doc_id, round(sum(c * lr), 6) AS log_w
         FROM dng JOIN model USING (ng)
         GROUP BY doc_id
         ORDER BY log_w DESC, doc_id LIMIT 25""",
    // distinct-n mirrored: same tokenization, same bigram fold, ratios
    // rounded after a double division
    "q165_distinct_ngrams" ->
      """WITH t AS (
           SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         u AS (SELECT source, unnest(toks) AS ng FROM t),
         b AS (SELECT source, unnest(list_transform(range(len(toks) - 1),
           i -> toks[i+1] || ' ' || toks[i+2])) AS ng FROM t),
         ru AS (SELECT source, count(*) AS total_1,
                  count(DISTINCT ng) AS distinct_1 FROM u GROUP BY source),
         rb AS (SELECT source, count(*) AS total_2,
                  count(DISTINCT ng) AS distinct_2 FROM b GROUP BY source)
         SELECT source, total_1, distinct_1,
           round(distinct_1::DOUBLE / total_1, 6) AS ratio_1,
           total_2, distinct_2,
           round(distinct_2::DOUBLE / total_2, 6) AS ratio_2
         FROM ru JOIN rb USING (source) ORDER BY source""",
    // the top-2-gram argmax mirrored as max-of-struct (count first,
    // then the ngram string — most-FREQUENT wins per Gopher's rule,
    // coverage computed from the winner)
    "q166_top_ngram" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         tot AS (
           SELECT doc_id, list_sum(list_transform(toks, x -> length(x))) AS chars
           FROM t),
         ng AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
           i -> toks[i+1] || ' ' || toks[i+2])) AS ng FROM t),
         c AS (SELECT doc_id, ng, count(*) AS cnt FROM ng GROUP BY doc_id, ng),
         top AS (
           SELECT doc_id,
             max(struct_pack(cnt := cnt, ng := ng)) AS s
           FROM c GROUP BY doc_id)
         SELECT top.doc_id, s.ng AS top_ngram,
           round(CASE WHEN chars > 0
                 THEN (s.cnt * (length(s.ng) - 1))::DOUBLE / chars
                 ELSE 0.0::DOUBLE END, 6) AS top_ngram_char_frac
         FROM top JOIN tot USING (doc_id) ORDER BY doc_id""",
    // repeated-2-gram coverage: occurrences beyond the first, capped
    "q167_dup_ngram" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         tot AS (
           SELECT doc_id, list_sum(list_transform(toks, x -> length(x))) AS chars
           FROM t),
         ng AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
           i -> toks[i+1] || ' ' || toks[i+2])) AS ng FROM t),
         c AS (SELECT doc_id, ng, count(*) AS cnt FROM ng GROUP BY doc_id, ng),
         dup AS (
           SELECT doc_id, coalesce(sum(CASE WHEN cnt >= 2
             THEN (cnt - 1) * (length(ng) - 1) END), 0) AS dup_chars
           FROM c GROUP BY doc_id)
         SELECT dup.doc_id,
           round(CASE WHEN chars > 0
             THEN least(1.0::DOUBLE, dup_chars::DOUBLE / chars)
             ELSE 0.0::DOUBLE END, 6) AS dup_ngram_char_frac
         FROM dup JOIN tot USING (doc_id) ORDER BY doc_id""",
    // store sizes from the corpus: forest rows = first-seen-wins vector
    // dedup survivors × 8 trees; bm25 docs = distinct indexed doc_ids.
    // clean bits are recounted truths (0 residual refs → 1).
    "q143_takedown" ->
      """WITH surv AS (
           SELECT min(vec_id) AS vid FROM embeddings GROUP BY embedding),
         purge AS (SELECT doc_id AS id FROM documents WHERE doc_id % 17 = 0)
         SELECT * FROM (
           SELECT 'ann_forest' AS store,
             (SELECT count(*) FROM surv) * 8 AS n_before,
             (SELECT count(*) FROM surv
               WHERE vid NOT IN (SELECT id FROM purge)) * 8 AS n_after,
             1 AS clean
           UNION ALL
           SELECT 'bm25',
             (SELECT count(DISTINCT doc_id) FROM documents),
             (SELECT count(DISTINCT doc_id) FROM documents
               WHERE doc_id NOT IN (SELECT id FROM purge)),
             1) t
         ORDER BY store""",
    // full-outer diff with the same drop construction; status from the
    // same null-safe comparison
    "q142_snapshot_diff" ->
      """WITH o AS (
           SELECT doc_id, text, lang, source FROM documents WHERE doc_id % 7 <> 0),
         n AS (
           SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
             lang, source
           FROM documents WHERE doc_id % 11 <> 0)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text IS NOT DISTINCT FROM n.text
                 AND o.lang IS NOT DISTINCT FROM n.lang
                 AND o.source IS NOT DISTINCT FROM n.source THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM o FULL OUTER JOIN n ON n.doc_id = o.doc_id
         ORDER BY doc_id""",
    // NB train+score replayed exactly: integer token counts, identical
    // ln((c+1)/(T+V)) float path, 6dp rounding, argmax on rounded.
    "q141_nb_classifier" ->
      """WITH base AS (
           SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text
           FROM documents),
         toks AS (
           SELECT doc_id, y,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
           FROM base),
         tk AS (SELECT * FROM toks WHERE tok <> ''),
         cnt AS (
           SELECT tok, sum(y)::BIGINT AS c1, sum(1 - y)::BIGINT AS c0
           FROM tk GROUP BY tok),
         tot AS (
           SELECT sum(c1)::BIGINT AS t1, sum(c0)::BIGINT AS t0,
             count(*)::BIGINT AS v
           FROM cnt),
         pri AS (SELECT sum(y)::BIGINT AS n1, sum(1 - y)::BIGINT AS n0 FROM base),
         dt AS (SELECT doc_id, tok, count(*)::BIGINT AS c_dt
           FROM tk GROUP BY doc_id, tok),
         parts AS (
           SELECT d.doc_id,
             sum(d.c_dt * ln((c.c1 + 1)::DOUBLE / (t.t1 + t.v))) AS p1,
             sum(d.c_dt * ln((c.c0 + 1)::DOUBLE / (t.t0 + t.v))) AS p0
           FROM dt d JOIN cnt c ON c.tok = d.tok, tot t
           GROUP BY d.doc_id),
         sc AS (
           SELECT b.doc_id,
             round(ln(n1::DOUBLE / (n1 + n0)) + coalesce(p.p1, 0.0), 6) AS s1,
             round(ln(n0::DOUBLE / (n1 + n0)) + coalesce(p.p0, 0.0), 6) AS s0
           FROM (SELECT DISTINCT doc_id FROM base) b
           LEFT JOIN parts p ON p.doc_id = b.doc_id, pri)
         SELECT doc_id, s1, s0,
           CASE WHEN s1 > s0 THEN 1 ELSE 0 END AS pred
         FROM sc ORDER BY doc_id""",
    // dHash pairs replayed in closed form: the xorshift pixel mix, the
    // per-id pixel inversion, the luminance comparisons, and the
    // Hamming count all in exact BIGINT arithmetic — no codec.
    "q140_phash_neardup" ->
      """WITH ng AS (SELECT greatest(count(*) // 31, 1) AS g FROM documents),
         grid AS (
           -- HUGEINT hop here too: gid*1000003 grows with the corpus
           -- (g = n/31), and ×2.65e9 exceeds signed-64 beyond ~3.5k
           -- groups; Scala wraps mod 2^64 (exact mod 2^32 after the
           -- mask), DuckDB must go wide instead
           SELECT doc_id, x::BIGINT AS x, y::BIGINT AS y,
             CAST(((doc_id % (SELECT g FROM ng)) * 1000003 + x + y*9)::HUGEINT
               * 2654435761 % 4294967296 AS BIGINT) AS v1
           FROM documents, range(9) t1(x), range(8) t2(y)),
         m1 AS (
           -- HUGEINT hop: a 32-bit value times the 2.2e9 multiplier can
           -- exceed signed-64 range; Scala wraps mod 2^64 (exact mod
           -- 2^32 after the mask), DuckDB would raise instead
           SELECT doc_id, x, y,
             CAST(xor(v1, v1 // 65536)::HUGEINT * 2246822519 % 4294967296
               AS BIGINT) AS v2
           FROM grid),
         px AS (
           SELECT doc_id, x, y,
             CASE WHEN x = (doc_id*7) % 9 AND y = (doc_id*5) % 8
               THEN 255 - xor(v2, v2 // 8192) % 256
               ELSE xor(v2, v2 // 8192) % 256 END AS g
           FROM m1),
         bits AS (
           SELECT a.doc_id, a.y*8 + a.x AS k,
             CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS bit
           FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
           WHERE a.x < 8)
         SELECT p.doc_id AS id_a, q.doc_id AS id_b,
           CAST(sum(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS INT) AS ham
         FROM bits p JOIN bits q ON q.k = p.k AND p.doc_id < q.doc_id
         GROUP BY p.doc_id, q.doc_id
         HAVING sum(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) <= 6
         ORDER BY id_a, id_b""",
    // Bloom prefilter is exact (no false negatives) — same oracle shape
    // as q69 at the 0.4 threshold.
    "q139_bloom_decontaminate" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1)),
             i -> regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+2], '') || ' ' ||
                  coalesce(regexp_split_to_array(lower(trim(text)), '\s+')[i+3], ''))) AS sh
           FROM documents)
         SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
           CAST(len(list_intersect(t.sh, b.sh)) AS BIGINT) AS n_common,
           CAST(len(list_intersect(t.sh, b.sh)) AS DOUBLE) / len(b.sh) AS frac
         FROM s t, s b
         WHERE t.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
           AND CAST(len(list_intersect(t.sh, b.sh)) AS DOUBLE) / len(b.sh) >= 0.4
         ORDER BY train_id, bench_id""",
    "q138_drift_stream" ->
      """WITH p AS (SELECT ((max(doc_id) + 5) // 5) AS step FROM documents),
         tk AS (
           SELECT doc_id // (SELECT step FROM p) AS b, tok FROM (
             SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             FROM documents) u
           WHERE tok <> ''),
         cbt AS (SELECT b, tok, count(*) AS c_bt FROM tk GROUP BY b, tok),
         cum AS (SELECT b, tok, c_bt,
             sum(c_bt) OVER (PARTITION BY tok ORDER BY b
               ROWS UNBOUNDED PRECEDING) AS c_t
           FROM cbt),
         nb AS (SELECT b, sum(c_bt) AS n_b FROM cbt GROUP BY b),
         nn AS (SELECT b, n_b,
             sum(n_b) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS n_tot
           FROM nb)
         SELECT c.b AS batch, n.n_b::BIGINT AS n_tokens,
           count(*)::BIGINT AS vocab,
           round(sum(c.c_bt * ln(c.c_bt::DOUBLE / c.c_t)) / n.n_b
             + ln(n.n_tot::DOUBLE / n.n_b), 6) AS kl
         FROM cum c JOIN nn n ON n.b = c.b
         GROUP BY c.b, n.n_b, n.n_tot ORDER BY batch""",
    // sketch-checked cardinality: exact distinct + constant-truth bits
    "q137_distinct_sketch" ->
      """SELECT source, count(DISTINCT tok)::BIGINT AS exact_distinct,
           1 AS hll_ok, 1 AS merge_ok
         FROM (SELECT source,
                 unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               FROM documents) u
         WHERE tok <> '' GROUP BY source ORDER BY source""",
    // MMR greedy unrolled to k=5 plain-SQL steps (recursive CTEs can't
    // aggregate over the recursive relation). Constants spelled
    // 0.7::DOUBLE / (1.0::DOUBLE - 0.7::DOUBLE) so both engines compute
    // the same IEEE lambda terms ((1.0 - 0.7) != 0.3 in binary).
    "q106_mmr_rerank" ->
      """WITH cand AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS rel
           FROM embeddings ORDER BY rel DESC, vec_id LIMIT 50),
         s1 AS (SELECT vec_id, v, 0.7::DOUBLE * rel AS mmr
                FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
         p2 AS (SELECT c.vec_id, c.v,
                  0.7::DOUBLE * c.rel - (1.0::DOUBLE - 0.7::DOUBLE) *
                    list_cosine_similarity(c.v, (SELECT v FROM s1)) AS mmr
                FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)),
         s2 AS (SELECT vec_id, v, mmr FROM p2 ORDER BY mmr DESC, vec_id LIMIT 1),
         p3 AS (SELECT c.vec_id, c.v,
                  0.7::DOUBLE * c.rel - (1.0::DOUBLE - 0.7::DOUBLE) * greatest(
                    list_cosine_similarity(c.v, (SELECT v FROM s1)),
                    list_cosine_similarity(c.v, (SELECT v FROM s2))) AS mmr
                FROM cand c WHERE c.vec_id NOT IN (
                  SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)),
         s3 AS (SELECT vec_id, v, mmr FROM p3 ORDER BY mmr DESC, vec_id LIMIT 1),
         p4 AS (SELECT c.vec_id, c.v,
                  0.7::DOUBLE * c.rel - (1.0::DOUBLE - 0.7::DOUBLE) * greatest(
                    list_cosine_similarity(c.v, (SELECT v FROM s1)),
                    list_cosine_similarity(c.v, (SELECT v FROM s2)),
                    list_cosine_similarity(c.v, (SELECT v FROM s3))) AS mmr
                FROM cand c WHERE c.vec_id NOT IN (
                  SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                  UNION SELECT vec_id FROM s3)),
         s4 AS (SELECT vec_id, v, mmr FROM p4 ORDER BY mmr DESC, vec_id LIMIT 1),
         p5 AS (SELECT c.vec_id, c.v,
                  0.7::DOUBLE * c.rel - (1.0::DOUBLE - 0.7::DOUBLE) * greatest(
                    list_cosine_similarity(c.v, (SELECT v FROM s1)),
                    list_cosine_similarity(c.v, (SELECT v FROM s2)),
                    list_cosine_similarity(c.v, (SELECT v FROM s3)),
                    list_cosine_similarity(c.v, (SELECT v FROM s4))) AS mmr
                FROM cand c WHERE c.vec_id NOT IN (
                  SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                  UNION SELECT vec_id FROM s3 UNION SELECT vec_id FROM s4)),
         s5 AS (SELECT vec_id, v, mmr FROM p5 ORDER BY mmr DESC, vec_id LIMIT 1)
         SELECT 1 AS rank, vec_id, round(mmr, 6) AS mmr FROM s1
         UNION ALL SELECT 2, vec_id, round(mmr, 6) FROM s2
         UNION ALL SELECT 3, vec_id, round(mmr, 6) FROM s3
         UNION ALL SELECT 4, vec_id, round(mmr, 6) FROM s4
         UNION ALL SELECT 5, vec_id, round(mmr, 6) FROM s5
         ORDER BY rank""",
    // batch form of the q106 greedy: per-step argmax becomes a
    // row_number over PARTITION BY qid — one SQL serves every query
    "q108_mmr_batch" ->
      """WITH q AS (
           SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.qid, e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS rel
           FROM embeddings e CROSS JOIN q),
         cand AS (
           SELECT qid, vec_id, v, rel FROM (
             SELECT qid, vec_id, v, rel,
               row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
             FROM scored) t WHERE rn <= 20),
         s1 AS (
           SELECT qid, vec_id, v, 0.7::DOUBLE * rel AS mmr FROM (
             SELECT qid, vec_id, v, rel,
               row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
             FROM cand) t WHERE rn = 1),
         p2 AS (
           SELECT c.qid, c.vec_id, c.v,
             0.7::DOUBLE * c.rel - (1.0::DOUBLE - 0.7::DOUBLE) *
               list_cosine_similarity(c.v, s1.v) AS mmr
           FROM cand c JOIN s1 ON c.qid = s1.qid AND c.vec_id <> s1.vec_id),
         s2 AS (SELECT qid, vec_id, v, mmr FROM (
             SELECT qid, vec_id, v, mmr,
               row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rn
             FROM p2) t WHERE rn = 1),
         p3 AS (
           SELECT c.qid, c.vec_id, c.v,
             0.7::DOUBLE * c.rel - (1.0::DOUBLE - 0.7::DOUBLE) * greatest(
               list_cosine_similarity(c.v, s1.v),
               list_cosine_similarity(c.v, s2.v)) AS mmr
           FROM cand c
           JOIN s1 ON c.qid = s1.qid JOIN s2 ON c.qid = s2.qid
           WHERE c.vec_id <> s1.vec_id AND c.vec_id <> s2.vec_id),
         s3 AS (SELECT qid, vec_id, mmr FROM (
             SELECT qid, vec_id, mmr,
               row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rn
             FROM p3) t WHERE rn = 1)
         SELECT qid, 1 AS rank, vec_id, round(mmr, 6) AS mmr FROM s1
         UNION ALL SELECT qid, 2, vec_id, round(mmr, 6) FROM s2
         UNION ALL SELECT qid, 3, vec_id, round(mmr, 6) FROM s3
         ORDER BY qid, rank""",
    "q109_embedding_drift" ->
      """WITH j AS (
           SELECT d.source, CAST(k AS INTEGER) AS dim,
             CAST(e.embedding[CAST(k AS INTEGER) + 1] AS DOUBLE) AS x
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id, range(64) t(k)),
         ps AS (SELECT source, dim, avg(x) AS m, count(*) AS n FROM j GROUP BY source, dim),
         g AS (SELECT dim, avg(x) AS gm FROM j GROUP BY dim),
         gg AS (SELECT sum(gm * gm) AS gg FROM g),
         f AS (
           SELECT ps.source, max(ps.n) AS n_vecs,
             sum(ps.m * g.gm) AS dot, sum(ps.m * ps.m) AS nn
           FROM ps JOIN g USING (dim) GROUP BY ps.source)
         SELECT source, n_vecs,
           round(dot / (sqrt(nn) * sqrt((SELECT gg FROM gg))), 6) AS cos_to_global
         FROM f ORDER BY source""",
    // same separated formula as Drift.klBySlice:
    // KL = kl_num / n_s + ln(N / n_s) — minimizes float-path divergence
    "q107_source_drift" ->
      """WITH toks AS (
           SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
           FROM documents),
         cs AS (SELECT source, tok, count(*)::BIGINT AS c_st FROM toks GROUP BY source, tok),
         ct AS (SELECT tok, sum(c_st)::BIGINT AS c_t FROM cs GROUP BY tok),
         tot AS (SELECT sum(c_t)::BIGINT AS n_total FROM ct),
         agg AS (
           SELECT cs.source, sum(cs.c_st)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
             sum(cs.c_st::DOUBLE * ln(cs.c_st::DOUBLE / ct.c_t::DOUBLE)) AS kl_num
           FROM cs JOIN ct USING (tok) GROUP BY cs.source)
         SELECT source, n_tokens, vocab,
           round(kl_num / n_tokens::DOUBLE
             + ln((SELECT n_total FROM tot)::DOUBLE / n_tokens::DOUBLE), 6) AS kl
         FROM agg ORDER BY source"""
  )
}
