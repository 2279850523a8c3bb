package graft

import org.apache.spark.sql.functions._

import graft.operators.{CountStore, HhStore}

/** Per-group Misra-Gries heavy-hitters store: hand-computed merge
  * algebra, the published guarantees (underestimate, bounded
  * undercount, no false dropouts among true heavies), the exact-when-
  * uncompressed degeneration, and the ledger skip. */
class HhStoreSpec extends SparkSpec {
  import spark.implicits._

  private def clean(name: String): Unit = {
    for (t <- Seq(s"${name}_hh", s"${name}_hh_n", s"${name}_hh_params",
        s"${name}_applied", s"${name}_stale"))
      graft.sources.Sinks.dropTable(spark, t)
    CountStore.setBuilding(spark, name, on = false)
  }

  private def items(xs: (String, Int)*) =
    xs.flatMap { case (it, n) => Seq.fill(n)(("g", it)) }
      .toDF("grp", "item")

  test("merge algebra matches the hand-computed Misra-Gries trace (k=2)") {
    clean("hh_t1")
    // wave 1: a×5 b×3 c×2 -> counts (a5 b3 c2); (k+1)=3rd largest is
    // c's 2 -> compress leaves {a:3, b:1}
    HhStore.initStore(items("a" -> 5, "b" -> 3, "c" -> 2), "hh_t1",
      "grp", "item", k = 2)
    val s1 = spark.table("hh_t1_hh").as[(String, String, Long)]
      .collect().map(r => r._2 -> r._3).toMap
    assert(s1 === Map("a" -> 3L, "b" -> 1L))
    // wave 2: c×4 b×1 -> summed {a:3, b:2, c:4}; 3rd largest is b's 2
    // -> compress leaves {c:2, a:1}
    assert(HhStore.applyBatch(items("c" -> 4, "b" -> 1), "hh_t1",
      "grp", "item", batchId = 1L))
    val s2 = spark.table("hh_t1_hh").as[(String, String, Long)]
      .collect().map(r => r._2 -> r._3).toMap
    assert(s2 === Map("c" -> 2L, "a" -> 1L))
    // guarantees vs the true totals (a5 b4 c6, n=15): the exact d
    // bound is the sum of the two compress offsets (2 + 2 = 4, under
    // the classic floor(15/3) = 5); every estimate undercounts,
    // undercount <= d, and every item with true > d (c and a) is
    // present
    assert(s2("c") <= 6 && 6 - s2("c") <= 4)
    assert(s2("a") <= 5 && 5 - s2("a") <= 4)
    val nRow = spark.table("hh_t1_hh_n").head()
    assert(nRow.getLong(1) === 15L)
    assert(nRow.getLong(2) === 4L, "d must be the exact offset sum")
  }

  test("removeDocsExact: untracked departures subtract n in place; tracked ones refuse") {
    clean("hh_r1")
    // k=2 over a5 b3 c2: summary {a:3, b:1}, n=10, d=2; c is untracked
    HhStore.initStore(items("a" -> 5, "b" -> 3, "c" -> 2), "hh_r1",
      "grp", "item", k = 2)
    // a departure touching tracked item a must do nothing and refuse
    assert(!HhStore.removeDocsExact(items("a" -> 1), "hh_r1", "grp", "item"))
    assert(spark.table("hh_r1_hh_n").head().getLong(1) === 10L)
    // removing both c occurrences (untracked) succeeds: n 10 -> 8,
    // d unchanged, summary untouched
    assert(HhStore.removeDocsExact(items("c" -> 2), "hh_r1", "grp", "item"))
    val nRow = spark.table("hh_r1_hh_n").head()
    assert(nRow.getLong(1) === 8L)
    assert(nRow.getLong(2) === 2L)
    val s = spark.table("hh_r1_hh").as[(String, String, Long)]
      .collect().map(r => r._2 -> r._3).toMap
    assert(s === Map("a" -> 3L, "b" -> 1L))
    // SOUNDNESS on the reduced corpus (a5 b3): est <= true,
    // undercount <= d, every item with true > d present — note the
    // CLASSIC bound floor(8/3) = 2 would also still cover here, but d
    // is what the serve promises and what provably survives removal
    assert(s("a") <= 5 && 5 - s("a") <= 2)
    assert(s("b") <= 3 && 3 - s("b") <= 2)
    // a departure that was never added fails loud (n would go negative)
    intercept[IllegalArgumentException] {
      HhStore.removeDocsExact(
        Seq.fill(9)(("g2", "zz")).toDF("grp", "item"), "hh_r1", "grp", "item")
    }
  }

  test("k covering the distinct items degenerates to exact counts across waves") {
    clean("hh_t2")
    HhStore.initStore(items("a" -> 5, "b" -> 3, "c" -> 2), "hh_t2",
      "grp", "item", k = 10)
    HhStore.applyBatch(items("c" -> 4, "b" -> 1, "d" -> 2), "hh_t2",
      "grp", "item", batchId = 1L)
    val got = spark.table("hh_t2_hh").as[(String, String, Long)]
      .collect().map(r => r._2 -> r._3).toMap
    assert(got === Map("a" -> 5L, "b" -> 4L, "c" -> 6L, "d" -> 2L))
  }

  test("re-delivered batch id is skipped (ledger)") {
    clean("hh_t3")
    HhStore.initStore(items("a" -> 2), "hh_t3", "grp", "item", k = 4)
    assert(HhStore.applyBatch(items("a" -> 1), "hh_t3", "grp", "item", 7L))
    assert(!HhStore.applyBatch(items("a" -> 1), "hh_t3", "grp", "item", 7L))
    val got = spark.table("hh_t3_hh").as[(String, String, Long)].collect()
    assert(got.toSeq === Seq(("g", "a", 3L)))
  }

  test("topHitters serves rank + error envelope; counters bounded by k") {
    clean("hh_t4")
    // two groups, k=2: group h never compresses (2 items)
    val df = items("a" -> 5, "b" -> 3, "c" -> 2)
      .unionByName(Seq.fill(4)(("h", "x")).toDF("grp", "item"))
      .unionByName(Seq.fill(2)(("h", "y")).toDF("grp", "item"))
    HhStore.initStore(df, "hh_t4", "grp", "item", k = 2)
    val perGroup = spark.table("hh_t4_hh").groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    assert(perGroup.values.forall(_ <= 2))
    val top = HhStore.topHitters(spark, "hh_t4", n = 1)
      .as[(String, Int, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the envelope is the EXACT d, not floor(n/(k+1)): g compressed
    // once with offset 2 (d=2 < floor(10/3)=3) -> a: est 3, hi 5;
    // h never compressed (d=0) -> x is served EXACT: est 4, hi 4
    assert(top("g") === (("g", 1, "a", 3L, 5L)))
    assert(top("h") === (("h", 1, "x", 4L, 4L)))
  }

  test("pre-r12 store without a d column serves the classic envelope, not an AnalysisException") {
    clean("hh_t5")
    // a5 b3 c2 at k=2: n=10, one compress with offset 2
    HhStore.initStore(items("a" -> 5, "b" -> 3, "c" -> 2), "hh_t5",
      "grp", "item", k = 2)
    // simulate a warehouse written before d tracking landed: same
    // table, d column dropped
    val legacy = spark.table("hh_t5_hh_n").select("grp", "n").localCheckpoint()
    graft.sources.Sinks.parquetTable(legacy, "hh_t5_hh_n")
    val top = HhStore.topHitters(spark, "hh_t5", n = 1).head()
    // classic bound floor(10/(2+1)) = 3 (the exact d would be 2) —
    // valid here because a d-less store predates removeDocsExact, so
    // no removal ever shrank its n
    assert(top.getAs[String]("item") === "a")
    assert(top.getAs[Long]("cnt") === 3L)
    assert(top.getAs[Long]("cnt_hi") === 6L)
  }

  test("maxStale serve: fresh store never pays the refresh; an unwired refresh thunk fails LOUD") {
    clean("hh_t6")
    HhStore.initStore(items("a" -> 5, "b" -> 3), "hh_t6", "grp", "item", k = 4)
    // fresh store: the refresh thunk must NOT run
    var refreshed = false
    val top = HhStore.topHitters(spark, "hh_t6", n = 1, maxStale = 0,
      refresh = () => { refreshed = true })
    assert(top.count() === 1 && !refreshed)
    // stale store + a thunk that does not actually settle THIS store:
    // serving silently stale under a "guaranteed" face is the failure
    // mode serveWithin exists to kill
    CountStore.markStale(spark, "hh_t6", 2L)
    val e = intercept[IllegalArgumentException] {
      HhStore.topHitters(spark, "hh_t6", n = 1, maxStale = 0,
        refresh = () => { refreshed = true })
    }
    assert(refreshed, "the thunk must be attempted before failing")
    assert(e.getMessage.contains("refresh"))
    // a thunk that DOES settle it serves fine
    val top2 = HhStore.topHitters(spark, "hh_t6", n = 1, maxStale = 0,
      refresh = () => CountStore.clearStale(spark, "hh_t6"))
    assert(top2.count() === 1)
  }

  test("stream-fed store equals the one-shot build (exact regime; ledger wired)") {
    clean("hh_s1"); clean("hh_s1f")
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString
    val all = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("h", "x"),
      ("g", "c"), ("h", "x"), ("h", "y"), ("g", "a"))
    def write(rows: Seq[(String, String)]) =
      rows.toDF("grp", "item").repartition(1)
        .write.mode("append").parquet(dir)
    write(all.slice(0, 3))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    HhStore.initStore(spark.range(0).selectExpr("'g' AS grp", "'z' AS item")
      .filter("1=0"), "hh_s1", "grp", "item", k = 10)
    val q = HhStore.maintainStream(stream, "hh_s1", "grp", "item").start()
    q.processAllAvailable()
    write(all.slice(3, 6)); q.processAllAvailable()
    write(all.slice(6, 8)); q.processAllAvailable()
    q.stop()
    // k covers the distincts, so wave-split MG == exact == one-shot
    HhStore.initStore(all.toDF("grp", "item"), "hh_s1f", "grp", "item", k = 10)
    for (t <- Seq("_hh", "_hh_n")) {
      val m = spark.table("hh_s1" + t); val f = spark.table("hh_s1f" + t)
      assert(m.exceptAll(f).unionAll(f.exceptAll(m)).isEmpty,
        s"stream-fed $t diverged")
    }
  }

  test("guarantees hold on fixture n-grams (randomized-shape corpus)") {
    clean("hh_t5")
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val grams = docs.select(col("source").as("grp"),
        explode(expr(
          """transform(sequence(1, greatest(size(split(lower(trim(text)), '\\s+')) - 2, 1)),
             i -> concat_ws(' ', slice(split(lower(trim(text)), '\\s+'), i, 3)))"""))
          .as("item"))
      .localCheckpoint()
    val w1 = grams.filter(xxhash64(col("item")) % 2 === 0)
    val w2 = grams.filter(xxhash64(col("item")) % 2 =!= 0)
    val k = 30
    HhStore.initStore(w1, "hh_t5", "grp", "item", k)
    HhStore.applyBatch(w2, "hh_t5", "grp", "item", 1L)
    val truth = grams.groupBy("grp", "item").agg(count(lit(1)).as("t"))
    val n = grams.groupBy("grp").agg(count(lit(1)).as("n"))
    val joined = spark.table("hh_t5_hh")
      .join(truth, Seq("grp", "item")).join(n, Seq("grp"))
      .select(col("cnt"), col("t"), floor(col("n") / (k + 1)).as("bound"))
      .localCheckpoint()
    assert(joined.filter(col("cnt") > col("t")).isEmpty, "overestimate")
    assert(joined.filter(col("t") - col("cnt") > col("bound")).isEmpty,
      "undercount beyond n/(k+1)")
    // no false dropouts: every true heavy is in the store
    val heavies = truth.join(n, Seq("grp"))
      .filter(col("t") > floor(col("n") / (k + 1)))
    assert(heavies.join(spark.table("hh_t5_hh"), Seq("grp", "item"),
      "left_anti").isEmpty, "a true heavy dropped out")
  }

  test("drift, exact regime: deltas exact, envelope degenerate, new/vanished flagged") {
    for (n <- Seq("hh_da", "hh_db")) clean(n)
    HhStore.initStore(items("a" -> 5, "b" -> 3, "c" -> 2), "hh_da",
      "grp", "item", k = 100)
    HhStore.initStore(items("a" -> 1, "b" -> 7, "d" -> 4), "hh_db",
      "grp", "item", k = 100)
    val rows = HhStore.drift(spark, "hh_da", "hh_db")
      .orderBy(col("item")).collect()
      .map(r => (r.getString(1), (r.getLong(2), r.getLong(3), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getString(9)))).toMap
    assert(rows("a") === ((5L, 1L, -4L, -4L, -4L, "both")))
    assert(rows("b") === ((3L, 7L, 4L, 4L, 4L, "both")))
    assert(rows("c") === ((2L, 0L, -2L, -2L, -2L, "vanished")))
    assert(rows("d") === ((0L, 4L, 4L, 4L, 4L, "new")))
  }

  test("drift, compressed regime: envelope contains the true delta for every union item") {
    for (n <- Seq("hh_ea", "hh_eb")) clean(n)
    val a = items("a" -> 9, "b" -> 4, "c" -> 2, "e" -> 1)
    val b = items("a" -> 3, "d" -> 8, "e" -> 5, "c" -> 1)
    HhStore.initStore(a, "hh_ea", "grp", "item", k = 2)
    HhStore.initStore(b, "hh_eb", "grp", "item", k = 2)
    val ta = a.groupBy("item").agg(count(lit(1)).as("ta"))
    val tb = b.groupBy("item").agg(count(lit(1)).as("tb"))
    val truth = ta.join(tb, Seq("item"), "full_outer")
      .select(col("item"), (coalesce(col("tb"), lit(0L)) -
        coalesce(col("ta"), lit(0L))).as("td"))
    val bad = HhStore.drift(spark, "hh_ea", "hh_eb")
      .join(truth, Seq("item"))
      .filter(col("td") < col("delta_lo") || col("td") > col("delta_hi"))
    assert(bad.isEmpty, "true delta escaped the composed MG envelope")
    // a group on one side only: its absent-side totals read 0, not null
    val oneSided = HhStore.drift(spark, "hh_ea", "hh_eb")
    assert(oneSided.filter(col("n_a").isNull || col("n_b").isNull).isEmpty)
  }
}
