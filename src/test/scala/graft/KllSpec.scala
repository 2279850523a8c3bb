package graft

import org.apache.spark.sql.functions._

import graft.operators.{CountStore, QuantileStore}

/** Native KLL quantile sketches + the standing quantile store:
  * exact-n tracking, realized rank error inside the published ε(k)
  * envelope, partial-aggregation merge correctness, the store
  * lifecycle, and the SQL faces. Rank-error checks use 3ε margins —
  * the declared statistical-oracle policy (KLL compaction is
  * randomized; ε(200) ≈ 1.65% at 99% confidence). */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private val k = 200
  private val eps = graft.functions.KllSketch.normalizedRankError(k)

  test("kll_n is exact and the median lands within the rank-error envelope") {
    val n = 100000
    val df = spark.range(n).select(col("id").cast("double").as("v"),
      lit("g").as("grp")).repartition(16)
    val sk = df.groupBy("grp")
      .agg(QuantileStore.kllSketchAgg(col("v"), k).as("sk"))
    val row = sk.select(QuantileStore.kllN(col("sk")).as("n"),
      QuantileStore.kllQuantile(col("sk"), lit(0.5)).as("med")).head()
    assert(row.getLong(0) === n.toLong)
    // uniform 0..n-1: value at true rank p is ~p*n; realized rank of
    // the estimate must sit within 3 eps of 0.5
    val realizedRank = row.getDouble(1) / n
    assert(math.abs(realizedRank - 0.5) <= 3 * eps,
      s"median rank $realizedRank vs 0.5 (eps $eps)")
  }

  test("merge of partial sketches preserves n and the envelope (kll_merge_agg)") {
    val parts = spark.range(50000)
      .select(col("id").cast("double").as("v"), (col("id") % 4).as("part"))
      .groupBy("part")
      .agg(QuantileStore.kllSketchAgg(col("v"), k).as("sk"))
    val merged = parts.agg(QuantileStore.kllMergeAgg(col("sk")).as("sk"))
      .select(QuantileStore.kllN(col("sk")).as("n"),
        QuantileStore.kllQuantile(col("sk"), lit(0.9)).as("p90")).head()
    assert(merged.getLong(0) === 50000L)
    assert(math.abs(merged.getDouble(1) / 50000 - 0.9) <= 3 * eps)
  }

  test("merge ADOPTS the incoming k (placeholder buffer never degrades accuracy)") {
    // the merge buffer starts as a k=8 placeholder; if it were merged
    // into (instead of replaced by) the first sketch, the result would
    // carry k=8's ~13% rank error instead of k=200's ~1.65%
    val parts = spark.range(20000)
      .select(col("id").cast("double").as("v"), (col("id") % 8).as("part"))
      .groupBy("part")
      .agg(QuantileStore.kllSketchAgg(col("v"), k).as("sk"))
    val bytes = parts.agg(QuantileStore.kllMergeAgg(col("sk")).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val merged = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))
    assert(merged.getK === k, s"merge degraded k to ${merged.getK}")
    assert(merged.getN === 20000L)
  }

  test("nulls are skipped; an empty group serves null quantiles") {
    val df = Seq((Some(1.0), "a"), (None, "a"), (None, "b"))
      .toDF("v", "grp")
    val out = df.groupBy("grp")
      .agg(QuantileStore.kllSketchAgg(col("v"), k).as("sk"))
      .select(col("grp"), QuantileStore.kllN(col("sk")).as("n"),
        QuantileStore.kllQuantile(col("sk"), lit(0.5)).as("med"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) === 1L && out("a").getDouble(2) === 1.0)
    assert(out("b").getLong(1) === 0L && out("b").isNullAt(2))
  }

  test("store lifecycle: waves fold, n exact, ledger skips re-delivery") {
    val name = "kll_t1"
    for (t <- Seq(s"${name}_kll", s"${name}_kll_params", s"${name}_applied"))
      graft.sources.Sinks.dropTable(spark, t)
    CountStore.setBuilding(spark, name, on = false)
    def wave(lo: Int, hi: Int) = spark.range(lo, hi)
      .select((col("id") % 3).cast("string").as("g"),
        col("id").cast("double").as("v"))
    QuantileStore.initStore(wave(0, 30000), name, "g", "v", k)
    assert(QuantileStore.applyBatch(wave(30000, 60000), name, "g", "v", 1L))
    assert(!QuantileStore.applyBatch(wave(30000, 60000), name, "g", "v", 1L))
    val served = QuantileStore.quantiles(spark, name, Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(served.size === 3)
    for ((_, r) <- served) {
      assert(r.getLong(1) === 20000L) // n exact per group
      // uniform ids mod 3: per-group values are ~uniform over 0..60000
      for ((p, i) <- Seq(0.1, 0.5, 0.9).zipWithIndex)
        assert(math.abs(r.getDouble(2 + i) / 60000 - p) <= 3 * eps + 0.001,
          s"p$p served ${r.getDouble(2 + i)}")
    }
  }

  test("stream-fed quantile store: exact n per group, served ranks in envelope") {
    val name = "kll_s1"
    for (t <- Seq(s"${name}_kll", s"${name}_kll_params", s"${name}_applied"))
      graft.sources.Sinks.dropTable(spark, t)
    CountStore.setBuilding(spark, name, on = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_kll_stream").toString
    def write(lo: Int, hi: Int) = spark.range(lo, hi)
      .select((col("id") % 2).cast("string").as("g"),
        col("id").cast("double").as("v"))
      .repartition(1).write.mode("append").parquet(dir)
    write(0, 10000)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    QuantileStore.initStore(
      spark.range(0).selectExpr("'x' AS g", "CAST(0 AS DOUBLE) AS v")
        .filter("1=0"), name, "g", "v", k)
    val q = QuantileStore.maintainStream(stream, name, "g", "v").start()
    q.processAllAvailable()
    write(10000, 30000); q.processAllAvailable()
    q.stop()
    val served = QuantileStore.quantiles(spark, name, Seq(0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    // the init'd empty group "x" may linger with n=0; both streamed
    // groups carry exactly their fed counts and a mid-envelope median
    for (g <- Seq("0", "1")) {
      assert(served(g).getLong(1) === 15000L, s"group $g n")
      assert(math.abs(served(g).getDouble(2) / 30000 - 0.5) <= 3 * eps + 0.01)
    }
  }

  test("SQL faces mirror the Column faces over the same stored sketch") {
    GraftSession.registerFunctions(spark)
    val name = "kll_t1" // built by the previous test
    spark.sql(
      s"""SELECT grp, kll_n(sk) AS n, kll_quantile(sk, 0.5d) AS med
          FROM ${name}_kll""").createOrReplaceTempView("kll_sql_serve")
    val viaSql = spark.table("kll_sql_serve")
    val viaCol = spark.table(s"${name}_kll")
      .select(col("grp"), QuantileStore.kllN(col("sk")).as("n"),
        QuantileStore.kllQuantile(col("sk"), lit(0.5)).as("med"))
    assert(viaSql.exceptAll(viaCol).unionAll(viaCol.exceptAll(viaSql)).isEmpty)
    // and a SQL-side aggregation build works end to end
    val sqlAgg = spark.sql(
      """SELECT kll_n(kll_merge_agg(sk)) AS n FROM kll_t1_kll""").head()
    assert(sqlAgg.getLong(0) === 60000L)
  }

  test("drift across two stores: exact n both sides, deltas track the known shift (r12)") {
    import spark.implicits._
    for (n <- Seq("kll_da", "kll_db"))
      for (t <- Seq(n + "_kll", n + "_kll_params", n + "_applied",
          n + "_layout", n + "_stale"))
        graft.sources.Sinks.dropTable(spark, t)
    // snapshot A: g uniform 1..1000, h uniform 1..1000
    // snapshot B: g shifted +500, h unchanged; B also adds group i
    def mk(rows: Seq[(String, Double)], name: String) =
      QuantileStore.initStore(rows.toDF("grp", "v"), name, "grp", "v")
    val g1k = (1 to 1000).map(i => ("g", i.toDouble))
    val h1k = (1 to 1000).map(i => ("h", i.toDouble))
    mk(g1k ++ h1k, "kll_da")
    mk(g1k.map { case (g, v) => (g, v + 500) } ++ h1k ++
      (1 to 50).map(i => ("i", i.toDouble)), "kll_db")
    val d = QuantileStore.drift(spark, "kll_da", "kll_db", Seq(0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    // exact n on both sides; the vanished/new group keeps nulls
    assert(d("g").getLong(1) === 1000L && d("g").getLong(2) === 1000L)
    assert(d("i").isNullAt(1) && d("i").getLong(2) === 50L)
    // g's median moved ~+500, h's ~0 (3ε envelope each side -> the
    // delta is within ~2·3ε·range of the true shift)
    val eps = graft.functions.KllSketch.normalizedRankError(200)
    val tol = 2 * 3 * eps * 1000 + 1
    assert(math.abs(d("g").getDouble(5) - 500.0) <= tol,
      s"g median delta ${d("g").getDouble(5)}")
    assert(math.abs(d("h").getDouble(5)) <= tol)
  }
}
