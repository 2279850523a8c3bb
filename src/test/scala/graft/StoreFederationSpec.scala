package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CountStore, HhStore, LmStore, NbStore, QuantileStore, SampleStore, SketchStore}

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
        "_counts", "_class", "_tri", "_bi", "_uni",
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
    // merging INTO a side refuses on every family (overwrite-while-
    // reading — the Bm25.mergeIndexes guard, uniform since round 14)
    val e = intercept[IllegalArgumentException] {
      HhStore.mergeStores(spark, "fed_ma", "fed_mb", "fed_ma")
    }
    assert(e.getMessage.contains("third store"))
    intercept[IllegalArgumentException] {
      NbStore.mergeStores(spark, "fed_ma", "fed_mb", "fed_mb")
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

  test("HLL drift: delta ≡ estimate(b) − estimate(a); one-sided groups flagged, not zeroed") {
    clean("fed_dla", "fed_dlb")
    val a = ((0 until 100).map(i => ("g1", i.toLong)) ++
      (0 until 40).map(i => ("g2", i.toLong))).toDF("grp", "id")
    val b = ((0 until 150).map(i => ("g1", i.toLong)) ++
      (0 until 25).map(i => ("g3", i.toLong))).toDF("grp", "id")
    SketchStore.initStore(a, "fed_dla", "grp", "id")
    SketchStore.initStore(b, "fed_dlb", "grp", "id")
    val d = SketchStore.drift(spark, "fed_dla", "fed_dlb")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getString(4)))).toMap
    // sparse regime: estimates are exact here, so deltas read exactly
    assert(d("g1") === ((Some(100.0), Some(150.0), Some(50.0), "both")))
    assert(d("g2")._2.isEmpty && d("g2")._4 === "vanished")
    assert(d("g3")._1.isEmpty && d("g3")._4 === "new")
    // pointwise identity vs the serve faces, whatever the regime
    val ests = (SketchStore.estimate(spark, "fed_dla")
      .withColumnRenamed("n_distinct_est", "ea"))
      .join(SketchStore.estimate(spark, "fed_dlb")
        .withColumnRenamed("n_distinct_est", "eb"), Seq("grp"), "full_outer")
    val mismatch = SketchStore.drift(spark, "fed_dla", "fed_dlb")
      .join(ests, Seq("grp"))
      .filter(!(col("est_a") <=> col("ea")) ||
        !(col("est_b") <=> col("eb")) ||
        !(col("delta_est") <=> (col("eb") - col("ea"))))
    assert(mismatch.isEmpty, "drift diverged from the serve faces")
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

  test("staleness inheritance (r13 advice, medium): merged store carries the union backlog") {
    clean("fed_ta", "fed_tb", "fed_tc", "fed_ua", "fed_ub", "fed_uc")
    HhStore.initStore(items(("g", "a", 3)), "fed_ta", "grp", "item", k = 10)
    HhStore.initStore(items(("g", "b", 2)), "fed_tb", "grp", "item", k = 10)
    CountStore.markStale(spark, "fed_ta", nGone = 5L)
    CountStore.markStale(spark, "fed_ta", nGone = 2L)
    CountStore.markStale(spark, "fed_tb", nGone = 1L)
    HhStore.mergeStores(spark, "fed_ta", "fed_tb", "fed_tc")
    assert(CountStore.stalePending(spark, "fed_tc") === ((3L, 8L)),
      "merged store must inherit both sides' backlogs, not launder them")
    // fresh ⊕ fresh still yields a fresh store
    HhStore.initStore(items(("g", "a", 1)), "fed_ua", "grp", "item", k = 10)
    HhStore.initStore(items(("g", "b", 1)), "fed_ub", "grp", "item", k = 10)
    HhStore.mergeStores(spark, "fed_ua", "fed_ub", "fed_uc")
    assert(CountStore.stalePending(spark, "fed_uc") === ((0L, 0L)))
  }

  test("inherited backlog composes with serveWithin: maxStale = 0 on a merged store forces the settle") {
    clean("fed_wa", "fed_wb", "fed_wc")
    val liveA = items(("g", "a", 4), ("g", "b", 2))
    val liveB = items(("g", "c", 3))
    HhStore.initStore(liveA, "fed_wa", "grp", "item", k = 100)
    HhStore.initStore(liveB, "fed_wb", "grp", "item", k = 100)
    // side a defers a takedown wave — backlog 1 rides into the merge
    CountStore.markStale(spark, "fed_wa", nGone = 2L)
    HhStore.mergeStores(spark, "fed_wa", "fed_wb", "fed_wc")
    assert(CountStore.stalePending(spark, "fed_wc")._1 === 1L)
    // an unwired refresh fails LOUD — inheritance keeps the contract teeth
    intercept[IllegalArgumentException] {
      HhStore.topHitters(spark, "fed_wc", n = 3, maxStale = 0,
        refresh = () => ()).collect()
    }
    // the real refresh (re-init over the union live corpus) settles it
    val served = HhStore.topHitters(spark, "fed_wc", n = 3, maxStale = 0,
      refresh = () => HhStore.initStore(liveA.unionByName(liveB),
        "fed_wc", "grp", "item", k = 100)).collect()
    assert(CountStore.stalePending(spark, "fed_wc") === ((0L, 0L)))
    assert(served.map(r => (r.getString(2), r.getLong(3))).toSet ===
      Set(("a", 4L), ("c", 3L), ("b", 2L)))
  }

  test("sample federation inherits _stale_ids; one refitStale settles the merged store") {
    clean("fed_va", "fed_vb", "fed_vc")
    // disjoint GROUPS so group g's merged sample is exactly side a's —
    // the departed row provably rides the stale side into the merge
    val a = (0 until 12).map(i => ("g", i.toLong, (100 + i).toLong))
      .toDF("grp", "id", "w")
    val b = (12 until 24).map(i => ("h", i.toLong, (10 + i).toLong))
      .toDF("grp", "id", "w")
    SampleStore.initStore(a, "fed_va", "grp", "id", "w", k = 4)
    SampleStore.initStore(b, "fed_vb", "grp", "id", "w", k = 4)
    // side a records a deferred departure of one of its SAMPLED ids
    val gone = SampleStore.sample(spark, "fed_va")
      .select("id").as[Long].head()
    SampleStore.markStale(spark, "fed_va", Seq(gone).toDF("id"), nGone = 1L)
    SampleStore.mergeStores(spark, "fed_va", "fed_vb", "fed_vc")
    assert(CountStore.stalePending(spark, "fed_vc") === ((1L, 1L)))
    assert(spark.table("fed_vc_stale_ids").as[Long].collect().toSet === Set(gone))
    assert(SampleStore.sample(spark, "fed_vc")
      .filter(col("id") === gone).count() === 1L,
      "precondition: the departed id rides the stale side's sample into the merge")
    val live = a.unionByName(b).filter(col("id") =!= gone)
    SampleStore.refitStale(spark, "fed_vc", live, "grp", "id", "w")
    assert(CountStore.stalePending(spark, "fed_vc") === ((0L, 0L)))
    assert(SampleStore.sample(spark, "fed_vc").filter(col("id") === gone).isEmpty,
      "refitStale over the union-live corpus must prune the inherited departure")
  }

  // NB/LM federation (round 14): counts are plain additive integers,
  // buckets = 8 everywhere below = spark.sql.shuffle.partitions — the
  // conf where the bucketed-union hazard's repartition workaround is
  // elided (BucketedUnionHazardSpec), so these cases certify the
  // full-outer-join merges under the hazardous regime,
  // so the merge is EXACT with no envelope — and there are no summary
  // parameters (k/lgK) to mismatch; a wrong-family merge fails loud at
  // the table read. NB/LM never defer takedowns (exact in-place
  // subtraction), so there is no staleness to inherit.
  test("merge is associative: merge(merge(a,b),c) ≡ one-shot fit of a∪b∪c (exact families)") {
    clean("fed_3a", "fed_3b", "fed_3c", "fed_3ab", "fed_3abc", "fed_3f")
    val a = items(("g", "a", 5), ("h", "x", 2))
    val b = items(("g", "b", 3), ("h", "y", 1))
    val c = items(("g", "a", 2), ("g", "c", 4))
    HhStore.initStore(a, "fed_3a", "grp", "item", k = 100)
    HhStore.initStore(b, "fed_3b", "grp", "item", k = 100)
    HhStore.initStore(c, "fed_3c", "grp", "item", k = 100)
    HhStore.mergeStores(spark, "fed_3a", "fed_3b", "fed_3ab")
    HhStore.mergeStores(spark, "fed_3ab", "fed_3c", "fed_3abc")
    HhStore.initStore(a.unionByName(b).unionByName(c), "fed_3f",
      "grp", "item", k = 100)
    assert(tablesEq("fed_3abc_hh", "fed_3f_hh"), "3-way HH summaries diverged")
    assert(tablesEq("fed_3abc_hh_n", "fed_3f_hh_n"), "3-way n/d diverged")
  }

  test("a merged NB model is a first-class store: applyBatch folds a stream batch exactly") {
    clean("fed_ya", "fed_yb", "fed_yc", "fed_yf")
    val a = Seq((1L, "the cat sat", "en"), (2L, "le chat", "fr"))
      .toDF("doc_id", "text", "label")
    val b = Seq((3L, "der hund", "de"), (4L, "the dog ran", "en"))
      .toDF("doc_id", "text", "label")
    val batch = Seq((5L, "cat and dog", "en"), (6L, "chien noir", "fr"))
      .toDF("doc_id", "text", "label")
    NbStore.initStore(a, "fed_ya", buckets = 8)
    NbStore.initStore(b, "fed_yb", buckets = 8)
    NbStore.mergeStores(spark, "fed_ya", "fed_yb", "fed_yc", buckets = 8)
    assert(NbStore.applyBatch(batch, "fed_yc", 8, "text", "label",
      batchId = 0L), "merged store must accept a stream batch")
    NbStore.initStore(a.unionByName(b).unionByName(batch), "fed_yf",
      buckets = 8)
    assert(tablesEq("fed_yc_counts", "fed_yf_counts"),
      "stream-fed merged model diverged from the one-shot fit")
    assert(tablesEq("fed_yc_class", "fed_yf_class"))
    // the merge reset the ledger: the batch landed exactly once and a
    // re-delivery is skipped
    assert(!NbStore.applyBatch(batch, "fed_yc", 8, "text", "label",
      batchId = 0L), "re-delivered batch must skip on the merged store")
  }

  test("empty-side federation: a shard that indexed nothing merges as the identity") {
    clean("fed_za", "fed_zb", "fed_zc")
    val a = items(("g", "a", 5), ("h", "x", 2))
    val empty = items().limit(0)
    HhStore.initStore(a, "fed_za", "grp", "item", k = 100)
    HhStore.initStore(empty, "fed_zb", "grp", "item", k = 100)
    HhStore.mergeStores(spark, "fed_za", "fed_zb", "fed_zc")
    assert(tablesEq("fed_zc_hh", "fed_za_hh"),
      "empty ⊕ x must serve x's summaries")
    assert(tablesEq("fed_zc_hh_n", "fed_za_hh_n"))
    // NB: an empty labeled corpus is a valid (empty) model side
    clean("fed_zna", "fed_znb", "fed_znc")
    val docs = Seq((1L, "the cat", "en")).toDF("doc_id", "text", "label")
    NbStore.initStore(docs, "fed_zna", buckets = 8)
    NbStore.initStore(docs.limit(0), "fed_znb", buckets = 8)
    NbStore.mergeStores(spark, "fed_zna", "fed_znb", "fed_znc", buckets = 8)
    assert(tablesEq("fed_znc_counts", "fed_zna_counts"))
    assert(tablesEq("fed_znc_class", "fed_zna_class"))
  }

  test("NB federation: merged model ≡ one-shot fit of the concatenated corpora") {
    clean("fed_na", "fed_nb", "fed_nc", "fed_nf")
    val a = Seq((1L, "the cat sat", "en"), (2L, "le chat noir", "fr"),
      (3L, "cat and dog ran", "en")).toDF("doc_id", "text", "label")
    val b = Seq((4L, "der hund lief", "de"), (5L, "the dog ran fast", "en"),
      (6L, "chat et chien", "fr")).toDF("doc_id", "text", "label")
    NbStore.initStore(a, "fed_na", buckets = 8)
    NbStore.initStore(b, "fed_nb", buckets = 8)
    NbStore.mergeStores(spark, "fed_na", "fed_nb", "fed_nc", buckets = 8)
    NbStore.initStore(a.unionByName(b), "fed_nf", buckets = 8)
    assert(tablesEq("fed_nc_counts", "fed_nf_counts"), "count tables diverged")
    assert(tablesEq("fed_nc_class", "fed_nf_class"), "class tables diverged")
    val docs = Seq((10L, "the cat ran"), (11L, "chat chien"),
      (12L, "hund lief")).toDF("doc_id", "text")
    val x = NbStore.classifyFromStore(spark, "fed_nc", docs)
    val y = NbStore.classifyFromStore(spark, "fed_nf", docs)
    assert(x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty,
      "merged-store classifications diverged from the union fit's")
  }

  test("LM federation: merged trigram LM ≡ one-shot fit; identical backoff scores") {
    clean("fed_ga", "fed_gb", "fed_gc", "fed_gf")
    val a = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("doc_id", "text")
    val b = Seq((3L, "a cat and a dog ran"),
      (4L, "the cat ran on the mat")).toDF("doc_id", "text")
    LmStore.initStore(a, "fed_ga", buckets = 8)
    LmStore.initStore(b, "fed_gb", buckets = 8)
    LmStore.mergeStores(spark, "fed_ga", "fed_gb", "fed_gc", buckets = 8)
    LmStore.initStore(a.unionByName(b), "fed_gf", buckets = 8)
    for (suf <- Seq("_tri", "_bi", "_uni"))
      assert(tablesEq("fed_gc" + suf, "fed_gf" + suf), s"$suf diverged")
    val probe = Seq((10L, "the cat ran on the rug"),
      (11L, "a dog sat")).toDF("doc_id", "text")
    val x = LmStore.scoreFromStore(spark, "fed_gc", probe)
    val y = LmStore.scoreFromStore(spark, "fed_gf", probe)
    assert(x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty,
      "merged-store backoff scores diverged from the union fit's")
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
