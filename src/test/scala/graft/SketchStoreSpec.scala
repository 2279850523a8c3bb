package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchStore
import graft.sources.Tables

class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sf0001)
    .select($"event_type", $"user_id", $"event_id")

  // exact estimate equality is a SPARSE-MODE property (coupon replay
  // preserves the HIP estimator below ~1k distincts per group); the
  // dense-regime contract is the 1% closeness test below
  test("maintained across 3 waves == fresh single-pass sketch (sparse mode: exact)") {
    SketchStore.initStore(ev.filter($"event_id" % 3 === 0),
      "graft_tsk_a", "event_type", "user_id", lgK = 12)
    SketchStore.applyBatch(ev.filter($"event_id" % 3 === 1),
      "graft_tsk_a", "event_type", "user_id", 1L)
    SketchStore.applyBatch(ev.filter($"event_id" % 3 === 2),
      "graft_tsk_a", "event_type", "user_id", 2L)
    SketchStore.initStore(ev, "graft_tsk_fresh", "event_type", "user_id", lgK = 12)
    val got = SketchStore.estimate(spark, "graft_tsk_a")
      .as[(String, Long)].collect().toMap
    val fresh = SketchStore.estimate(spark, "graft_tsk_fresh")
      .as[(String, Long)].collect().toMap
    assert(got === fresh)
  }

  test("estimates track exact distinct counts (lgK 12 on hundreds of users)") {
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val est = SketchStore.estimate(spark, "graft_tsk_fresh")
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n <= 0.05, s"$g: est ${est(g)} exact $n")
    }
  }

  test("dense regime: maintained within 1% of fresh (HIP vs composite estimator gap)") {
    // 90k distinct ids split in 3 waves — every sketch dense at
    // lgK=12, so the direct build serves HIP while the merged store
    // serves the composite estimator over the SAME registers; the
    // measured gap is 0 here and <=0.4% in the crossing band
    // (ProbeHllDivergence), gated at 1%
    val big = spark.range(0, 90000L)
      .selectExpr("CAST(id % 3 AS STRING) AS grp", "id", "id AS wave")
    SketchStore.initStore(big.filter($"id" % 7 < 3),
      "graft_tsk_dense", "grp", "id", lgK = 12)
    SketchStore.applyBatch(big.filter($"id" % 7 >= 3 && $"id" % 7 < 5),
      "graft_tsk_dense", "grp", "id", 1L)
    SketchStore.applyBatch(big.filter($"id" % 7 >= 5),
      "graft_tsk_dense", "grp", "id", 2L)
    SketchStore.initStore(big, "graft_tsk_dense_f", "grp", "id", lgK = 12)
    val m = SketchStore.estimate(spark, "graft_tsk_dense")
      .as[(String, Long)].collect().toMap
    val f = SketchStore.estimate(spark, "graft_tsk_dense_f")
      .as[(String, Long)].collect().toMap
    f.foreach { case (g, fv) =>
      assert(math.abs(m(g) - fv).toDouble / fv <= 0.01, s"$g: ${m(g)} vs $fv")
      assert(math.abs(fv - 30000L).toDouble / 30000L <= 0.05, s"$g accuracy: $fv")
    }
  }

  test("re-delivered batch id is a no-op (exactly-once ledger)") {
    val before = SketchStore.estimate(spark, "graft_tsk_a")
      .as[(String, Long)].collect().toMap
    val applied = SketchStore.applyBatch(ev.filter($"event_id" % 3 === 1),
      "graft_tsk_a", "event_type", "user_id", 1L)
    assert(!applied)
    val after = SketchStore.estimate(spark, "graft_tsk_a")
      .as[(String, Long)].collect().toMap
    assert(after === before)
  }

  test("wave order does not matter (union is commutative)") {
    SketchStore.initStore(ev.filter($"event_id" % 3 === 2),
      "graft_tsk_b", "event_type", "user_id", lgK = 12)
    SketchStore.applyBatch(ev.filter($"event_id" % 3 === 0),
      "graft_tsk_b", "event_type", "user_id", 10L)
    SketchStore.applyBatch(ev.filter($"event_id" % 3 === 1),
      "graft_tsk_b", "event_type", "user_id", 11L)
    val a = SketchStore.estimate(spark, "graft_tsk_a")
      .as[(String, Long)].collect().toMap
    val b = SketchStore.estimate(spark, "graft_tsk_b")
      .as[(String, Long)].collect().toMap
    assert(a === b)
  }

  test("stream-fed sketch store equals the one-shot fit (q220 discipline)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sk_stream").toString
    val all = (0 until 600).map(i => (s"t${i % 4}", (i * 7) % 97L, i.toLong))
    def write(rows: Seq[(String, Long, Long)]) =
      rows.toDF("event_type", "user_id", "event_id").repartition(1)
        .write.mode("append").parquet(dir)
    write(all.slice(0, 200))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // init on an EMPTY corpus: the store must bootstrap from waves
    SketchStore.initStore(
      Seq.empty[(String, Long, Long)].toDF("event_type", "user_id", "event_id"),
      "graft_tsk_s", "event_type", "user_id", lgK = 12)
    val q = SketchStore.maintainStream(stream, "graft_tsk_s",
      "event_type", "user_id").start()
    q.processAllAvailable()
    write(all.slice(200, 400))
    q.processAllAvailable()
    write(all.slice(400, 600))
    q.processAllAvailable()
    q.stop()
    SketchStore.initStore(all.toDF("event_type", "user_id", "event_id"),
      "graft_tsk_sf", "event_type", "user_id", lgK = 12)
    val m = SketchStore.estimate(spark, "graft_tsk_s")
      .as[(String, Long)].collect().toMap
    val f = SketchStore.estimate(spark, "graft_tsk_sf")
      .as[(String, Long)].collect().toMap
    assert(m === f)
  }

  test("serving an absent store fails loud") {
    intercept[Exception] {
      SketchStore.estimate(spark, "graft_tsk_nope").collect()
    }
  }

  test("describeStore reports groups, bytes, lg_k") {
    val d = SketchStore.describeStore(spark, "graft_tsk_a")
      .as[(String, Long)].collect().toMap
    assert(d("n_groups") >= 1L && d("sketch_bytes") > 0L && d("lg_k") === 12L)
  }
}
