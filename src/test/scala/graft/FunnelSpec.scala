package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** N-stage funnel semantics on a hand-checkable event log: strict
  * ordering, min-time completion, 4-stage chains, and equivalence with
  * the q113 composition. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Int, String)*) =
    rows.toSeq.toDF("user_id", "__s", "event_type")
      .select($"user_id",
        to_timestamp(lit("2026-01-01 00:00:00")).cast("timestamp")
          .plus(expr("make_interval(0,0,0,0,0,0,__s)")).as("ts"),
        $"event_type")

  test("4-stage funnel: strictly-after chaining, min-time completion") {
    // u1 completes all 4 in order; u2 stalls at stage 3 (d before c);
    // u3 has c BEFORE its first b -> not counted at c even though both
    // types exist; u4 only a; u5's b ties a's time exactly -> strict >
    // rejects it
    val e = ev(
      (1L, 0, "a"), (1L, 10, "b"), (1L, 20, "c"), (1L, 30, "d"),
      (2L, 0, "a"), (2L, 10, "b"), (2L, 5, "d"), (2L, 20, "c"),
      (3L, 0, "a"), (3L, 5, "c"), (3L, 10, "b"),
      (4L, 0, "a"),
      (5L, 0, "a"), (5L, 0, "b"))
    val got = Funnel.funnel(e, Seq("a", "b", "c", "d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
  }

  test("repeated stage events use the MIN qualifying time, later repeats are inert") {
    // u1: two b's — the EARLIER (t=10) gates stage c, so c@15 counts;
    // if the later b (t=40) gated, c@15 would fail
    val e = ev(
      (1L, 0, "a"), (1L, 10, "b"), (1L, 40, "b"), (1L, 15, "c"))
    val got = Funnel.funnel(e, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("single-stage funnel degenerates to a distinct-user count") {
    val e = ev((1L, 0, "a"), (1L, 5, "a"), (2L, 3, "a"), (3L, 1, "b"))
    val got = Funnel.funnel(e, Seq("a")).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("a", 2L)))
  }

  test("conversion window: a stage outside `within` of the previous completion is rejected") {
    // u1 converts b at +10s (inside a 30s window); u2's b lands at +60s
    // (outside); u3's FIRST b is outside but a later one inside — the
    // window gates on the previous stage's completion, so the +40s b
    // fails and the +20s b (earlier!) succeeds: min-qualifying wins
    val e = ev(
      (1L, 0, "a"), (1L, 10, "b"),
      (2L, 0, "a"), (2L, 60, "b"),
      (3L, 0, "a"), (3L, 40, "b"), (3L, 20, "b"))
    val got = Funnel.funnel(e, Seq("a", "b"), within = Some("INTERVAL 30 SECONDS"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 2L))
    // no window ≡ within=None admits u2 as well
    val open = Funnel.funnel(e, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(open === Map("a" -> 3L, "b" -> 3L))
  }

  test("conversionLags: exact integer micro sums per transition; non-converters excluded") {
    // u1: a@0 -> b@10 (lag 10s) -> c@25 (lag 15s); u2: a@0 -> b@30
    // (lag 30s), never c; u3: a only
    val e = ev(
      (1L, 0, "a"), (1L, 10, "b"), (1L, 25, "c"),
      (2L, 0, "a"), (2L, 30, "b"),
      (3L, 0, "a"))
    val got = Funnel.conversionLags(e, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      ("a", "b", 2L, 40L * 1000000L),
      ("b", "c", 1L, 15L * 1000000L)))
    // an empty transition reports (0, 0), not a missing row
    val none = Funnel.conversionLags(e, Seq("a", "c", "b"))
      .filter(col("from_stage") === "c").head()
    // c-after-a only u1 (c@25 > a@0); b-after-that-c: u1's b@10 < 25 -> none
    assert(none.getLong(2) === 0L && none.getLong(3) === 0L)
  }

  test("stateful funnel (batch mode) equals the declarative chain, windowed and open") {
    import graft.streaming.{FunnelEvent, FunnelStream}
    import org.apache.spark.sql.Dataset
    val ev = sources.Tables.events(spark, sf0001)
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_type")
    val evDs: Dataset[FunnelEvent] = ev.as[FunnelEvent]
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaState = counts(FunnelStream.report(
      FunnelStream.completions(evDs, Seq("view", "click", "purchase")).toDF(),
      Seq("view", "click", "purchase")))
    val viaChain = counts(Funnel.funnel(ev, Seq("view", "click", "purchase")))
    assert(viaState === viaChain)
    val win = 3600L * 1000000L
    val viaStateW = counts(FunnelStream.report(
      FunnelStream.completions(evDs, Seq("view", "click", "purchase"),
        withinUs = Some(win)).toDF(), Seq("view", "click", "purchase")))
    val viaChainW = counts(Funnel.funnel(ev, Seq("view", "click", "purchase"),
      within = Some("INTERVAL 1 HOUR")))
    assert(viaStateW === viaChainW)
  }

  test("stateful funnel under readStream: in-order micro-batches reproduce batch counts") {
    import graft.streaming.{FunnelEvent, FunnelStream, StageCompletion}
    val ev = sources.Tables.events(spark, sf0001)
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_type")
      .orderBy($"ts") // cross-batch contract: per-user event-time order
      .localCheckpoint()
    val n = ev.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_stream").toString
    // two event-time-ordered files -> two micro-batches
    val rows = ev.collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.take((n / 2).toInt).toSeq, 1), ev.schema)
      .write.mode("append").parquet(dir)
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.drop((n / 2).toInt).toSeq, 1), ev.schema)
      .write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .as[FunnelEvent]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = FunnelStream.completions(stream, Seq("view", "click", "purchase"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StageCompletion], _: Long) =>
        batch.collect().foreach(c => got.add((c.user_id, c.stage)))
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = got.toArray(Array.empty[(Long, String)]).toSet
    val batched = FunnelStream.completions(ev.as[FunnelEvent],
        Seq("view", "click", "purchase"))
      .collect().map(c => (c.user_id, c.stage)).toSet
    assert(streamed === batched)
    assert(streamed.nonEmpty)
  }

  test("evictStalled: deadline eviction is completion-safe; cold users re-enter") {
    import graft.streaming.{FunnelEvent, FunnelStream, StageCompletion}
    import org.apache.spark.sql.Dataset
    def run(evict: Boolean): Seq[(Long, Int)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_funnel_evict").toString
      val schema = ev((1L, 0, "a")).schema
      def write(rows: (Long, Int, String)*) =
        ev(rows: _*).repartition(1).write.mode("append").parquet(dir)
      // b1: u1 enters (deadline 0+100s); b2/b3: other users push the
      // watermark past the deadline (eviction fires in b3, where u1 has
      // no data); b4: u1 returns long after going cold
      write((1L, 0, "a"), (9L, 10, "a"))
      val mkStream = () => spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds").as[FunnelEvent]
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
      val q = FunnelStream.completions(mkStream(), Seq("a", "b"),
          withinUs = Some(100L * 1000000L), evictStalled = evict)
        .writeStream.outputMode("append")
        .foreachBatch { (b: Dataset[StageCompletion], _: Long) =>
          b.collect().foreach(c => got.add((c.user_id, c.stage_idx)))
        }
        .start()
      q.processAllAvailable()
      write((9L, 2000, "b")); q.processAllAvailable()
      write((8L, 2100, "a")); q.processAllAvailable()
      write((1L, 3000, "a")); q.processAllAvailable()
      q.stop()
      got.toArray(Array.empty[(Long, Int)]).toSeq
    }
    val evicted = run(evict = true)
    // u1's second 'a' starts a NEW funnel entry after eviction
    assert(evicted.count(c => c._1 == 1L && c._2 == 0) === 2, evicted.toString)
    val default = run(evict = false)
    // infinite-state default keeps batch single-entry semantics
    assert(default.count(c => c._1 == 1L && c._2 == 0) === 1, default.toString)
    // eviction never loses a completion emitted before the stall
    assert(evicted.toSet.filterNot(_ == ((1L, 0))) === default.toSet.filterNot(_ == ((1L, 0))))
  }

  test("operator at 3 stages reproduces the q113 fixture result") {
    val e = sources.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"event_type")
    val viaOp = Funnel.funnel(e, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent truth: per-user chained min times computed locally
    // (epoch micros via TIMESTAMP — the fixture's ts can arrive as NTZ,
    // which Row.getTimestamp refuses)
    val local = e.select($"user_id",
        expr("unix_micros(cast(ts as timestamp))").as("t"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def minAfter(stage: String, gate: Map[Long, Long]): Map[Long, Long] =
      local.filter(t => t._3 == stage && gate.get(t._1).exists(g => t._2 > g))
        .groupBy(_._1).map { case (u, ts) => u -> ts.map(_._2).min }
    val v = local.filter(_._3 == "view").groupBy(_._1)
      .map { case (u, ts) => u -> ts.map(_._2).min }
    val c = minAfter("click", v)
    val p = minAfter("purchase", c)
    assert(viaOp === Map("view" -> v.size.toLong,
      "click" -> c.size.toLong, "purchase" -> p.size.toLong))
  }
}
