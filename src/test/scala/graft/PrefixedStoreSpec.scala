package graft

import org.apache.spark.sql.functions._

import graft.operators.{CountStore, LmStore, NbStore}

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
