package graft

import org.apache.spark.sql.functions._

import graft.operators.{CountStore, HhStore, LmStore, NbStore, QuantileStore, SampleStore}

/** The prefix-partitioned count-store layout (v2): same CONTENT as
  * the plain layout under any merge history — only the rewrite scope
  * changes (delta-touched partitions instead of the whole model).
  * Content equality is checked table-for-table against plain-layout
  * twins driven through the identical schedule, plus the two
  * layout-specific hazards: a fully-cancelled partition must not
  * serve stale rows, and serving must hide the partition scaffolding. */
class PrefixedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def clean(names: String*): Unit = {
    for (n <- names) {
      for (suf <- Seq("_counts", "_class", "_tri", "_bi", "_uni",
          "_layout", "_applied"))
        graft.sources.Sinks.dropTable(spark, n + suf)
      CountStore.setBuilding(spark, n, on = false)
    }
  }

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "label")

  private val train = docs(
    (1L, "alpha beta gamma alpha", "a"),
    (2L, "beta beta delta", "a"),
    (3L, "gamma epsilon zeta eta", "b"),
    (4L, "theta iota kappa theta iota", "b"))
  private val delta = docs(
    (5L, "alpha lambda lambda", "a"),
    (6L, "mu nu xi gamma", "b"))

  private def eqT(a: String, b: String): Boolean = {
    val x = spark.table(a).drop("tok_pfx")
    val y = spark.table(b).drop("tok_pfx")
    x.exceptAll(y).unionAll(y.exceptAll(x)).isEmpty
  }

  test("NB: prefixed layout tracks the plain layout bit-for-bit through append+remove") {
    clean("pfx_nb", "plain_nb")
    NbStore.initStore(train, "pfx_nb", buckets = 4, prefixes = 8)
    NbStore.initStore(train, "plain_nb", buckets = 4)
    for (n <- Seq("pfx_nb", "plain_nb")) {
      NbStore.appendDocs(delta, n, buckets = 4)
      NbStore.removeDocs(train.filter(col("doc_id") === 2L), n, buckets = 4)
    }
    assert(eqT("pfx_nb_counts", "plain_nb_counts"))
    assert(eqT("pfx_nb_class", "plain_nb_class"))
    // serving hides the scaffolding and matches the plain store
    val q = docs((9L, "alpha beta unseen", "x")).drop("label")
    val a = NbStore.scoreFromStore(spark, "pfx_nb", q)
    val b = NbStore.scoreFromStore(spark, "plain_nb", q)
    assert(a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty)
  }

  test("LM: prefixed layout tracks the plain layout through append+remove; serve parity") {
    clean("pfx_lm", "plain_lm")
    LmStore.initStore(train, "pfx_lm", buckets = 4, prefixes = 8)
    LmStore.initStore(train, "plain_lm", buckets = 4)
    for (n <- Seq("pfx_lm", "plain_lm")) {
      LmStore.appendDocs(delta, n, buckets = 4)
      LmStore.removeDocs(delta.filter(col("doc_id") === 5L), n, buckets = 4)
    }
    for (t <- Seq("_tri", "_bi", "_uni"))
      assert(eqT("pfx_lm" + t, "plain_lm" + t), t)
    val q = docs((9L, "alpha beta gamma delta", "x")).drop("label")
    val a = LmStore.scoreFromStore(spark, "pfx_lm", q)
    val b = LmStore.scoreFromStore(spark, "plain_lm", q)
    assert(a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty)
  }

  test("a fully-cancelled partition drops instead of serving stale rows") {
    clean("pfx_nb2")
    // one doc -> remove it entirely: every touched partition cancels
    val one = docs((1L, "solo solitary", "a"))
    NbStore.initStore(one, "pfx_nb2", prefixes = 8)
    NbStore.removeDocs(one, "pfx_nb2")
    assert(spark.table("pfx_nb2_counts").isEmpty,
      "stale rows survived a full cancellation")
    // and the store still accepts a later append
    NbStore.appendDocs(docs((2L, "fresh start", "b")), "pfx_nb2")
    assert(spark.table("pfx_nb2_counts").count() === 2)
  }

  test("merge rewrites ONLY touched partitions (untouched files untouched)") {
    clean("pfx_nb3")
    NbStore.initStore(train, "pfx_nb3", prefixes = 16)
    def filesByPfx(): Map[Long, Set[String]] = spark.table("pfx_nb3_counts")
      .select(input_file_name().as("f"), col("tok_pfx")).distinct()
      .collect().groupBy(_.getLong(1))
      .map { case (k, rs) => k -> rs.map(_.getString(0)).toSet }
    val before = filesByPfx()
    // a delta touching ONE token ("alpha") touches exactly its prefix
    NbStore.appendDocs(docs((7L, "alpha", "a")), "pfx_nb3")
    val after = filesByPfx()
    val changed = before.keySet.filter(p => after.get(p) != before.get(p))
    assert(changed.size <= 1,
      s"a 1-token delta rewrote ${changed.size} partitions")
    assert((after.keySet -- before.keySet).size <= 1)
  }

  private def cleanFam(names: String*): Unit = {
    for (n <- names) {
      for (suf <- Seq("_hh", "_hh_n", "_hh_params", "_kll", "_kll_params",
          "_sample", "_sample_params", "_layout", "_applied", "_stale"))
        graft.sources.Sinks.dropTable(spark, n + suf)
      CountStore.setBuilding(spark, n, on = false)
    }
  }

  private def hhItems(xs: (String, String, Int)*) =
    xs.flatMap { case (g, it, n) => Seq.fill(n)((g, it)) }.toDF("grp", "item")

  test("HH: prefixed layout tracks the plain layout through init+merge+exact-remove; serve parity") {
    cleanFam("pfx_hh", "plain_hh")
    val w1 = hhItems(("g", "a", 5), ("g", "b", 3), ("g", "c", 2),
      ("h", "x", 4), ("h", "y", 2))
    val w2 = hhItems(("g", "c", 4), ("g", "b", 1), ("h", "y", 3))
    HhStore.initStore(w1, "pfx_hh", "grp", "item", k = 2, prefixes = 8)
    HhStore.initStore(w1, "plain_hh", "grp", "item", k = 2)
    for (n <- Seq("pfx_hh", "plain_hh")) {
      HhStore.mergeDocs(w2, n, "grp", "item")
      assert(HhStore.removeDocsExact(hhItems(("h", "zz", 1)), n,
        "grp", "item"))
    }
    assert(eqT("pfx_hh_hh", "plain_hh_hh"))
    assert(eqT("pfx_hh_hh_n", "plain_hh_hh_n"))
    val a = HhStore.topHitters(spark, "pfx_hh", n = 2)
    val b = HhStore.topHitters(spark, "plain_hh", n = 2)
    assert(a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty,
      "prefixed serve diverged from plain")
  }

  test("KLL: prefixed layout tracks the plain layout on served values (exact regime)") {
    cleanFam("pfx_kll", "plain_kll")
    val w1 = (1 to 40).map(i => (s"g${i % 3}", i.toDouble)).toDF("grp", "v")
    val w2 = (41 to 60).map(i => (s"g${i % 3}", i.toDouble)).toDF("grp", "v")
    QuantileStore.initStore(w1, "pfx_kll", "grp", "v", k = 200, prefixes = 8)
    QuantileStore.initStore(w1, "plain_kll", "grp", "v", k = 200)
    for (n <- Seq("pfx_kll", "plain_kll"))
      QuantileStore.mergeDocs(w2, n, "grp", "v")
    // ≤ k values per group: the sketch's exact regime, so served
    // quantiles are deterministic and must match across layouts
    val a = QuantileStore.quantiles(spark, "pfx_kll", Seq(0.1, 0.5, 0.9))
    val b = QuantileStore.quantiles(spark, "plain_kll", Seq(0.1, 0.5, 0.9))
    assert(a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty,
      "prefixed KLL serve diverged from plain")
  }

  test("Sample: prefixed layout tracks the plain layout through merge+dropDocs; serve parity") {
    cleanFam("pfx_smp", "plain_smp")
    def rows(xs: (String, Long, Long)*) = xs.toDF("grp", "doc_id", "w")
    val w1 = rows(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L),
      ("g", 4L, 40L), ("h", 5L, 5L), ("h", 6L, 6L))
    val w2 = rows(("g", 7L, 70L), ("h", 8L, 8L))
    val live = w1.unionByName(w2).filter(col("doc_id") =!= 3L)
    for ((n, p) <- Seq(("pfx_smp", 8), ("plain_smp", 0))) {
      SampleStore.initStore(w1, n, "grp", "doc_id", "w", k = 3, prefixes = p)
      SampleStore.mergeDocs(w2, n, "grp", "doc_id", "w")
      // id 3 is sampled in g -> its group refits from the live set
      SampleStore.dropDocs(spark, n, Seq(3L).toDF("id"), live,
        "grp", "doc_id", "w")
    }
    assert(eqT("pfx_smp_sample", "plain_smp_sample"))
    val a = SampleStore.sample(spark, "pfx_smp")
    val b = SampleStore.sample(spark, "plain_smp")
    assert(a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty,
      "prefixed sample serve diverged from plain")
  }

  test("HH v2: a wave touching one group rewrites at most its partitions") {
    cleanFam("pfx_hh3")
    val base = hhItems(("g0", "a", 3), ("g1", "b", 3), ("g2", "c", 3),
      ("g3", "dd", 3), ("g4", "e", 3), ("g5", "f", 3))
    HhStore.initStore(base, "pfx_hh3", "grp", "item", k = 4, prefixes = 16)
    def filesByPfx(t: String): Map[Long, Set[String]] = spark.table(t)
      .select(input_file_name().as("f"), col("tok_pfx")).distinct()
      .collect().groupBy(_.getLong(1))
      .map { case (k, rs) => k -> rs.map(_.getString(0)).toSet }
    val before = filesByPfx("pfx_hh3_hh")
    HhStore.mergeDocs(hhItems(("g1", "b", 2)), "pfx_hh3", "grp", "item")
    val after = filesByPfx("pfx_hh3_hh")
    val changed = before.keySet.filter(p => after.get(p) != before.get(p))
    assert(changed.size <= 1,
      s"a one-group wave rewrote ${changed.size} partitions")
  }

  test("prefixed prepare on a plain store fails loud (and vice-versa guard)") {
    clean("plain_nb4")
    NbStore.initStore(train, "plain_nb4", buckets = 4)
    intercept[IllegalArgumentException] {
      CountStore.preparePrefixed("plain_nb4_counts",
        Seq(("a", "alpha", 1L)).toDF("label", "token", "cnt"),
        Seq("token", "label"), Seq("cnt"), sign = 1L, prefixes = 8)
    }
  }

  test("removal below zero still fails loud in the prefixed layout") {
    clean("pfx_nb5")
    NbStore.initStore(train, "pfx_nb5", prefixes = 8)
    intercept[IllegalArgumentException] {
      NbStore.removeDocs(docs((99L, "alpha alpha alpha alpha alpha", "a")),
        "pfx_nb5")
    }
    // nothing was written — the store still equals the fresh fit
    clean("pfx_nb5_ref")
    NbStore.initStore(train, "pfx_nb5_ref", prefixes = 8)
    assert(eqT("pfx_nb5_counts", "pfx_nb5_ref_counts"))
  }
}
