package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CountStore, HhStore, QuantileStore, SampleStore, SketchStore}

/** FEDERATED store merges (round 13): two standing stores — two
  * crawls, two clusters, two time windows — combine into one with NO
  * corpus read, via the mergeable-summaries property each family's
  * wave merge already rides. The certifying invariants per family:
  * sample merge is EXACT (≡ one-shot fit of the union corpus), HH is
  * exact in the k-covers-distincts regime and contract-bounded
  * (n exact, est ≤ true, undercount ≤ d_c, heavies present) when
  * compressed, HLL estimates ≡ the union fit's (sparse regime), KLL
  * keeps exact n and exact-regime quantiles. Mixed-parameter merges
  * fail loud. */
class StoreFederationSpec extends SparkSpec {
  import spark.implicits._

  private def clean(names: String*): Unit = {
    for (n <- names; suf <- Seq("_hh", "_hh_n", "_hh_params", "_hll",
        "_hll_params", "_kll", "_kll_params", "_sample", "_sample_params",
        "_applied", "_stale", "_stale_ids", "_layout"))
      graft.sources.Sinks.dropTable(spark, n + suf)
    names.foreach(n => CountStore.setBuilding(spark, n, on = false))
  }

  private def tablesEq(a: String, b: String): Boolean = {
    val x = spark.table(a); val y = spark.table(b)
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  private def items(xs: (String, String, Int)*): DataFrame =
    xs.flatMap { case (g, it, n) => Seq.fill(n)((g, it)) }
      .toDF("grp", "item")

  test("HH federation, exact regime: merged store ≡ one-shot fit of the union") {
    clean("fed_ha", "fed_hb", "fed_hc", "fed_hf")
    val a = items(("g", "a", 5), ("g", "b", 3), ("h", "x", 2))
    val b = items(("g", "a", 1), ("g", "c", 4), ("h", "y", 7))
    HhStore.initStore(a, "fed_ha", "grp", "item", k = 10)
    HhStore.initStore(b, "fed_hb", "grp", "item", k = 10)
    HhStore.mergeStores(spark, "fed_ha", "fed_hb", "fed_hc")
    HhStore.initStore(a.unionByName(b), "fed_hf", "grp", "item", k = 10)
    assert(tablesEq("fed_hc_hh", "fed_hf_hh"), "summaries diverged")
    assert(tablesEq("fed_hc_hh_n", "fed_hf_hh_n"), "n/d tables diverged")
  }

  test("HH federation, compressed regime: n exact, est ≤ true, undercount ≤ d_c, heavies present") {
    clean("fed_ka", "fed_kb", "fed_kc")
    val a = items(("g", "a", 9), ("g", "b", 4), ("g", "c", 2))
    val b = items(("g", "a", 3), ("g", "d", 8), ("g", "e", 1))
    HhStore.initStore(a, "fed_ka", "grp", "item", k = 2)
    HhStore.initStore(b, "fed_kb", "grp", "item", k = 2)
    HhStore.mergeStores(spark, "fed_ka", "fed_kb", "fed_kc")
    val truth = a.unionByName(b).groupBy("grp", "item")
      .agg(count(lit(1)).as("t"))
    val nRow = spark.table("fed_kc_hh_n").head()
    assert(nRow.getLong(1) === 27L, "n must be the exact union total")
    val d = nRow.getLong(2)
    val j = spark.table("fed_kc_hh").join(truth, Seq("grp", "item"), "right")
      .select(col("item"), coalesce(col("cnt"), lit(0L)).as("est"), col("t"))
      .collect()
    for (r <- j) {
      assert(r.getLong(1) <= r.getLong(2), s"overestimate at ${r.getString(0)}")
      assert(r.getLong(2) - r.getLong(1) <= d,
        s"undercount beyond d_c at ${r.getString(0)}")
    }
    // every item with true > d_c must be tracked
    val stored = spark.table("fed_kc_hh").select("item")
      .as[String].collect().toSet
    for (r <- j if r.getLong(2) > d)
      assert(stored(r.getString(0)), s"heavy ${r.getString(0)} dropped out")
  }

  test("mixed parameters fail loud for every family") {
    clean("fed_ma", "fed_mb")
    HhStore.initStore(items(("g", "a", 1)), "fed_ma", "grp", "item", k = 2)
    HhStore.initStore(items(("g", "a", 1)), "fed_mb", "grp", "item", k = 3)
    intercept[IllegalArgumentException] {
      HhStore.mergeStores(spark, "fed_ma", "fed_mb", "fed_mc")
    }
    val dfa = Seq(("g", 1L)).toDF("grp", "id")
    SketchStore.initStore(dfa, "fed_ma", "grp", "id", lgK = 10)
    SketchStore.initStore(dfa, "fed_mb", "grp", "id", lgK = 12)
    intercept[IllegalArgumentException] {
      SketchStore.mergeStores(spark, "fed_ma", "fed_mb", "fed_mc")
    }
    val dfv = Seq(("g", 1.0)).toDF("grp", "v")
    QuantileStore.initStore(dfv, "fed_ma", "grp", "v", k = 200)
    QuantileStore.initStore(dfv, "fed_mb", "grp", "v", k = 400)
    intercept[IllegalArgumentException] {
      QuantileStore.mergeStores(spark, "fed_ma", "fed_mb", "fed_mc")
    }
    val dfs = Seq(("g", 1L, 5L)).toDF("grp", "id", "w")
    SampleStore.initStore(dfs, "fed_ma", "grp", "id", "w", k = 2)
    SampleStore.initStore(dfs, "fed_mb", "grp", "id", "w", k = 3)
    intercept[IllegalArgumentException] {
      SampleStore.mergeStores(spark, "fed_ma", "fed_mb", "fed_mc")
    }
  }

  test("HLL federation: merged estimates ≡ one-shot union fit (sparse regime)") {
    clean("fed_la", "fed_lb", "fed_lc", "fed_lf")
    val a = (0 until 300).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "id")
    val b = (200 until 500).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "id")
    SketchStore.initStore(a, "fed_la", "grp", "id")
    SketchStore.initStore(b, "fed_lb", "grp", "id")
    SketchStore.mergeStores(spark, "fed_la", "fed_lb", "fed_lc")
    SketchStore.initStore(a.unionByName(b), "fed_lf", "grp", "id")
    val x = SketchStore.estimate(spark, "fed_lc")
    val y = SketchStore.estimate(spark, "fed_lf")
    assert(x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty,
      "merged estimates diverged from the union fit")
  }

  test("KLL federation: exact n per group; exact-regime quantiles ≡ union fit") {
    clean("fed_qa", "fed_qb", "fed_qc", "fed_qf")
    val a = (0 until 40).map(i => (s"g${i % 2}", i.toDouble)).toDF("grp", "v")
    val b = (40 until 90).map(i => (s"g${i % 2}", i.toDouble)).toDF("grp", "v")
    QuantileStore.initStore(a, "fed_qa", "grp", "v")
    QuantileStore.initStore(b, "fed_qb", "grp", "v")
    QuantileStore.mergeStores(spark, "fed_qa", "fed_qb", "fed_qc")
    QuantileStore.initStore(a.unionByName(b), "fed_qf", "grp", "v")
    val x = QuantileStore.quantiles(spark, "fed_qc", Seq(0.1, 0.5, 0.9))
    val y = QuantileStore.quantiles(spark, "fed_qf", Seq(0.1, 0.5, 0.9))
    assert(x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty,
      "merged quantiles/n diverged from the union fit (exact regime)")
  }

  test("sample federation is EXACT: merged ≡ one-shot fit of the union; shared ids claim max weight") {
    clean("fed_sa", "fed_sb", "fed_sc", "fed_sf")
    val a = (0 until 30).map(i => (s"g${i % 3}", i.toLong, (10 + i).toLong))
      .toDF("grp", "id", "w")
    // overlap: ids 20-29 appear on BOTH sides, heavier on side b
    val b = (20 until 60).map(i => (s"g${i % 3}", i.toLong, (100 + i).toLong))
      .toDF("grp", "id", "w")
    SampleStore.initStore(a, "fed_sa", "grp", "id", "w", k = 4)
    SampleStore.initStore(b, "fed_sb", "grp", "id", "w", k = 4)
    SampleStore.mergeStores(spark, "fed_sa", "fed_sb", "fed_sc")
    SampleStore.initStore(a.unionByName(b), "fed_sf", "grp", "id", "w", k = 4)
    assert(tablesEq("fed_sc_sample", "fed_sf_sample"),
      "merged sample diverged from the one-shot union fit")
  }
}
