package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.sources.Tables

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly agg over a real readStream matches the batch plan") {
    // stage the events parquet into a directory (file-stream source needs one)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(dir)
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

  test("json props parse to integers") {
    val n = EventStreams.withParsedProps(Tables.events(spark, sf0001))
      .filter($"prop_k".isNotNull).count()
    assert(n > 0)
  }
}
