package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props-json).
  *
  * Each transform is written against a plain DataFrame so the SAME code
  * runs in batch (for the DuckDB oracle) and under `readStream` (for
  * the streaming tests) — the Structured Streaming model's core
  * guarantee, which we lean on instead of maintaining two codepaths.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling-window aggregate (hourly). In streaming mode callers add
    * `withWatermark("ts", ...)` before this; the plan is otherwise
    * identical. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      // group by the window column itself (not an extracted field) —
      // streaming append mode requires the event-time window in the
      // grouping keys to track watermark finalization
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("win.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked streaming variant: late data beyond 30 min dropped,
    * state bounded — the production shape for an unbounded stream. */
  def hourlyStatsStreaming(events: DataFrame): DataFrame =
    hourlyStats(events.withWatermark("ts", "30 minutes"))

  /** Sliding-window (1h window / 15m slide) event rate per type. */
  def slidingRate(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n_events"))

  /** JSON prop extraction (events.props is a JSON string). */
  def withParsedProps(events: DataFrame): DataFrame =
    events.withColumn("prop_k", get_json_object(col("props"), "$.k").cast(IntegerType))

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, n_events: Int, total_value: Double,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)
  case class SessionState(n: Int, total: Double, startUs: Long, lastUs: Long)

  // µs-precision Timestamp round-trips (getTime alone truncates to ms).
  private def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Shared gap-split fold — the single source of session semantics for
    * both batch and streaming paths. Events are processed in ts order;
    * an event within `gapUs` of the open session's SPAN (start−gap ..
    * last+gap) extends it — the max/min guards keep a late-but-valid
    * out-of-order event (possible across micro-batches when the
    * watermark delay > 0) from regressing `lastUs`/`startUs` and
    * corrupting later gap tests. An event beyond last+gap closes the
    * session; one before start−gap belongs to an already-gone earlier
    * session and is emitted as its own closed single-event session.
    * Returns (closed sessions, open trailing state).
    */
  private def foldSessions(
      uid: Long, events: Seq[SessionEvent], gapUs: Long,
      state0: Option[SessionState]): (Seq[Session], Option[SessionState]) = {
    val sorted = events.sortBy(e => toMicros(e.ts))
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur: Option[SessionState] = state0
    sorted.foreach { e =>
      val t = toMicros(e.ts)
      cur match {
        case Some(s) if t >= s.startUs - gapUs && t <= s.lastUs + gapUs =>
          cur = Some(SessionState(
            s.n + 1, s.total + e.value, math.min(s.startUs, t), math.max(s.lastUs, t)))
        case Some(s) if t > s.lastUs + gapUs =>
          closed += Session(uid, s.n, s.total, fromMicros(s.startUs), fromMicros(s.lastUs))
          cur = Some(SessionState(1, e.value, t, t))
        case Some(_) => // t < start - gap: straggler from a closed past session
          closed += Session(uid, 1, e.value, e.ts, e.ts)
        case None =>
          cur = Some(SessionState(1, e.value, t, t))
      }
    }
    (closed.toSeq, cur)
  }

  /** Batch sessionization via flatMapGroupsWithState. BATCH ONLY —
    * Spark invokes the function once per group with all data and
    * discards state, so the trailing session is emitted eagerly. Under
    * a stream that eager emit would fragment sessions spanning
    * micro-batches; use [[sessionizeStreaming]] there.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val (closed, open) = foldSessions(uid, it.toSeq, gapUs, state.getOption)
          state.remove()
          (closed ++ open.map(s =>
            Session(uid, s.n, s.total, fromMicros(s.startUs), fromMicros(s.lastUs)))).iterator
      }
  }

  /** Streaming sessionization: open sessions live in state with an
    * EVENT-TIME timeout at (last event + gap); a session is emitted only
    * when a gap-exceeding event arrives or the watermark passes its
    * timeout — so sessions spanning micro-batches stay whole and each
    * session is emitted exactly once. Input must carry a watermark on
    * `ts` before the groupByKey.
    */
  def sessionizeStreaming(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              Session(uid, s.n, s.total, fromMicros(s.startUs), fromMicros(s.lastUs)))
          } else {
            val (closed, open) = foldSessions(uid, it.toSeq, gapUs, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                // ceiling to ms: flooring could fire the timeout up to
                // 1 ms before the true boundary and split a session
                state.setTimeoutTimestamp((s.lastUs + gapUs + 999) / 1000)
              case None => if (state.exists) state.remove()
            }
            closed.iterator
          }
      }
  }

  /** Watermarked stream-stream interval join: each click joined to
    * purchases by the same user within the past hour. Both sides
    * watermarked so join state is bounded (Spark buffers only rows
    * young enough to still find a match). Works identically on batch
    * DataFrames — the interval condition becomes a plain range join.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(
      col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.select(
      col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"))
    c.join(p,
      c("user_id") === p("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming exact deduplication with bounded state.
    *
    * Plain `dropDuplicates(keys)` on a stream retains every key seen
    * since the query started — unbounded state on an unbounded stream.
    * `dropDuplicatesWithinWatermark` evicts a key's state once the
    * watermark passes its event time, so state is bounded by the
    * watermark horizon: the guarantee weakens from "globally unique"
    * to "no duplicate arrives within the watermark delay of the
    * first occurrence", which is the deliverable shape for at-least-
    * once ingest pipelines (a redelivered event arrives close to the
    * original; a true re-occurrence months later is a new event).
    * One shuffle on the key, same as batch dedup.
    */
  def dedupStreaming(events: DataFrame, keys: Seq[String],
      delay: String = "30 minutes", tsCol: String = "ts"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming bit-exact VECTOR dedup: the batch `Dedup.exactVectors`
    * semantics (reference src/lib.rs:64-79) on an unbounded vector
    * stream — key = raw IEEE-754 bits (so -0.0 ≠ 0.0 and NaN payloads
    * stay distinct, which Spark's native grouping equality would
    * normalize away), eviction by watermark as above. Rows must carry
    * an event-time column `ts`. */
  def dedupVectorsStreaming(vectors: DataFrame, vecCol: String,
      delay: String = "30 minutes", tsCol: String = "ts"): DataFrame =
    dedupStreaming(
      vectors.withColumn("__bitkey",
        graft.functions.VectorFunctions.floatBitsKey(col(vecCol))),
      Seq("__bitkey"), delay, tsCol)
      .drop("__bitkey")

  /** Replay the events parquet through a real streaming query into a
    * memory sink (synchronous, for tests). Returns the collected result. */
  def runStreamingHourly(spark: SparkSession, parquetPath: String): DataFrame = {
    val stream = spark.readStream.schema(eventSchema).parquet(parquetPath)
    val q = hourlyStatsStreaming(stream).writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName("graft_hourly")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table("graft_hourly")
  }
}
