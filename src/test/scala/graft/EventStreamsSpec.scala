package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.sources.Tables

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly agg over a real readStream matches the batch plan") {
    // stage the events parquet into a directory (file-stream source needs one)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // watermarks require TIMESTAMP; the driver fixture may carry ts as
    // TIMESTAMP_NTZ depending on its writer — normalize when staging
    Tables.events(spark, sf0001)
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(dir)
    val batchSchema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(batchSchema).parquet(dir)
    val q = EventStreams.hourlyStats(stream.withWatermark("ts", "30 minutes"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_hourly_test").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("graft_hourly_test")
      .orderBy("hour", "event_type").collect()
    val batch = EventStreams.hourlyStats(spark.read.parquet(dir))
      .orderBy("hour", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.nonEmpty)
  }

  test("sessionize splits on gaps > threshold and aggregates within sessions") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq(
      EventStreams.SessionEvent(1L, ts(0), 1.0),
      EventStreams.SessionEvent(1L, ts(10), 2.0),  // same session (gap 10m)
      EventStreams.SessionEvent(1L, ts(100), 4.0), // new session (gap 90m)
      EventStreams.SessionEvent(2L, ts(5), 8.0)
    ).toDS()
    val sessions = EventStreams.sessionize(ev, gapMinutes = 60)
      .collect().sortBy(s => (s.user_id, s.start_ts.getTime))
    assert(sessions.length === 3)
    assert(sessions(0).n_events === 2 && sessions(0).total_value === 3.0)
    assert(sessions(1).n_events === 1 && sessions(1).total_value === 4.0)
    assert(sessions(2).user_id === 2L)
  }

  test("watermark drops late data in append mode across micro-batches") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    def batch(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)], f: String) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("append").parquet(dir)
    // batch 1: events up to t=180min → watermark advances to 150min
    batch((0L until 8L).map(i => (i, ts(i * 25), 1L, "click", 1.0, "{}")), "b1")
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
    val agg = EventStreams.hourlyStats(stream.withWatermark("ts", "30 minutes"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_late_test").start()
    q.processAllAvailable()
    // batch 2: one event far in the past (t=10min) — behind the watermark
    batch(Seq((100L, ts(10), 1L, "late_marker", 99.0, "{}")), "b2")
    // and one current event to push processing forward
    batch(Seq((101L, ts(200), 1L, "click", 1.0, "{}")), "b3")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("graft_late_test")
    // the late event's type must never appear in emitted (finalized) windows
    assert(out.filter($"event_type" === "late_marker").count() === 0)
    assert(out.count() > 0)
  }

  test("sessionizeStreaming keeps sessions whole across micro-batches and emits once") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_stream").toString
    // base well past epoch 0: the initial watermark is 0, and events at
    // or below the watermark are dropped as late before reaching state
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]) =
      rows.toDF("user_id", "ts", "value").repartition(1)
        .write.mode("append").parquet(dir)
    // batch 1 and 2 form ONE session for user 1 (gap 30m < 60m threshold)
    write(Seq((1L, ts(0), 1.0)))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "0 seconds").as[EventStreams.SessionEvent]
    val q = EventStreams.sessionizeStreaming(stream, gapMinutes = 60)
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sess_stream_test").start()
    q.processAllAvailable()
    write(Seq((1L, ts(30), 2.0)))
    q.processAllAvailable()
    // advance the watermark far past user 1's timeout → session finalizes
    write(Seq((2L, ts(600), 9.0)))
    q.processAllAvailable()
    write(Seq((2L, ts(1300), 1.0))) // push watermark again so user 2's first closes too
    q.processAllAvailable()
    q.stop()
    val out = spark.table("graft_sess_stream_test")
      .filter($"user_id" === 1L).collect()
    assert(out.length === 1, s"user 1 must emit exactly one session, got ${out.toSeq}")
    assert(out.head.getAs[Int]("n_events") === 2)
    assert(out.head.getAs[Double]("total_value") === 3.0)
  }

  test("sessionizeStreaming absorbs a late-but-valid out-of-order event without corrupting the session") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_ooo").toString
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]) =
      rows.toDF("user_id", "ts", "value").repartition(1)
        .write.mode("append").parquet(dir)
    write(Seq((1L, ts(60), 1.0))) // batch 1: event at t=60
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "45 minutes").as[EventStreams.SessionEvent]
    val q = EventStreams.sessionizeStreaming(stream, gapMinutes = 60)
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sess_ooo_test").start()
    q.processAllAvailable()
    // batch 2: OUT-OF-ORDER event at t=30 (watermark is 60-45=15 → valid)
    write(Seq((1L, ts(30), 2.0)))
    q.processAllAvailable()
    // batch 3: event at t=90 — within gap of the TRUE last event (t=60);
    // a lastUs regression to t=30 would wrongly split here (90-30 <= 60 ok...
    // use t=150: 150-60=90>60 closes; 150-30=120>60 also closes — instead
    // assert the final session shape below)
    write(Seq((2L, ts(600), 9.0)))  // advance watermark far → user 1 times out
    q.processAllAvailable()
    write(Seq((2L, ts(1300), 1.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("graft_sess_ooo_test").filter($"user_id" === 1L).collect()
    assert(out.length === 1, s"one session expected, got ${out.toSeq}")
    val s = out.head
    assert(s.getAs[Int]("n_events") === 2)
    // start/end must span both events in event-time order despite arrival order
    assert(s.getAs[java.sql.Timestamp]("start_ts") === ts(30))
    assert(s.getAs[java.sql.Timestamp]("end_ts") === ts(60))
  }

  test("stream-stream interval join runs watermarked under readStream and matches batch") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    // normalize ts to TIMESTAMP for the watermark (see hourly-agg test)
    Tables.events(spark, sf0001)
      .withColumn("ts", $"ts".cast("timestamp"))
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.clickPurchaseJoin(
      stream.filter($"event_type" === "click").withWatermark("ts", "2 hours"),
      stream.filter($"event_type" === "purchase").withWatermark("ts", "2 hours"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_ssj_test").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_ssj_test")
      .orderBy("click_id", "purchase_id").collect()
    val ev = spark.read.parquet(dir)
    val batch = EventStreams.clickPurchaseJoin(
      ev.filter($"event_type" === "click"), ev.filter($"event_type" === "purchase"))
      .orderBy("click_id", "purchase_id").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.nonEmpty)
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark drops replays") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]) =
      rows.toDF("event_id", "ts", "value").repartition(1)
        .write.mode("append").parquet(dir)
    write(Seq((1L, ts(0), 1.0), (2L, ts(1), 2.0)))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.dedupStreaming(stream, Seq("event_id"), "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sdedup_test").start()
    q.processAllAvailable()
    // replay event 1 (at-least-once delivery) + a fresh event
    write(Seq((1L, ts(0), 1.0), (3L, ts(2), 3.0)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("graft_sdedup_test")
      .select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L), s"replay must dedup, got ${ids.toSeq}")
  }

  test("streaming vector dedup keys on raw bits: -0.0 ≠ 0.0, replays dropped") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("graft_svdedup").toString
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def write(rows: Seq[(Long, java.sql.Timestamp, Array[Float])]) =
      rows.toDF("vec_id", "ts", "embedding").repartition(1)
        .write.mode("append").parquet(dir)
    write(Seq(
      (1L, ts(0), Array(0.0f, 1f)),
      (2L, ts(1), Array(-0.0f, 1f)),    // bit-distinct from row 1 — a
                                        // native dropDuplicates would
                                        // normalize and merge these
      (3L, ts(2), Array(Float.NaN, 1f))))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.dedupVectorsStreaming(stream, "embedding", "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_svdedup_test").start()
    q.processAllAvailable()
    write(Seq(
      (4L, ts(3), Array(0.0f, 1f)),    // exact replay of row 1's bits → dropped
      (5L, ts(4), Array(2f, 1f))))     // fresh vector → kept
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("graft_svdedup_test")
      .select("vec_id").as[Long].collect().sorted
    // NOTE: non-canonical NaN payloads do NOT survive this path — the
    // UnsafeRow writer canonicalizes NaN on the way into the parquet
    // file (SPARK-26021), before the bit key is ever computed. The key
    // distinguishes payloads for in-memory rows (VectorFunctionsSpec);
    // through a file sink every NaN is already the canonical one.
    assert(ids.toSeq === Seq(1L, 2L, 3L, 5L),
      s"bit-key dedup must keep -0.0 and drop the replay, got ${ids.toSeq}")
  }

  test("streaming ingest composition: watermarked dedup → PQ encode on a live stream") {
    // the full compressed-ingest shape: unbounded vector stream,
    // duplicates dropped within the watermark, survivors encoded to
    // m-byte PQ codes — dedup is the only stateful stage, the encode
    // is a narrow stream-compatible projection
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("graft_sing").toString
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val batch = graft.sources.Tables.embeddings(spark, sf0001)
    val pq = graft.ann.PqIndex(m = 8, seed = 42L).fit(batch)
    def vec(seed: Int) = Array.tabulate(64)(i => (seed * 64 + i) / 4096.0f)
    def write(rows: Seq[(Long, java.sql.Timestamp, Array[Float])]) =
      rows.toDF("vec_id", "ts", "embedding").repartition(1)
        .write.mode("append").parquet(dir)
    write(Seq((1L, ts(0), vec(1)), (2L, ts(1), vec(2))))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = pq.encode(
        EventStreams.dedupVectorsStreaming(stream, "embedding", "2 hours"))
      .select("vec_id", "pq_code")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sing_test").start()
    q.processAllAvailable()
    write(Seq((3L, ts(2), vec(1)), (4L, ts(3), vec(4)))) // 3 = replay of 1
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("graft_sing_test").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.keySet === Set(1L, 2L, 4L), s"got ${rows.keySet}")
    // codes match the batch encoder bit for bit
    assert(java.util.Arrays.equals(rows(1L), pq.encodeVec(vec(1))))
    assert(java.util.Arrays.equals(rows(4L), pq.encodeVec(vec(4))))
  }

  test("json props parse to integers") {
    val n = EventStreams.withParsedProps(Tables.events(spark, sf0001))
      .filter($"prop_k".isNotNull).count()
    assert(n > 0)
  }
}
