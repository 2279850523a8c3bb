package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One funnel event (the `events` table projection the funnel needs). */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Per-user funnel progress: next stage index awaited + the previous
  * stage's completion time in micros (MinValue before stage 0). */
case class FunnelProgress(stage: Int, tUs: Long)

/** A stage completion — the append-mode output of [[FunnelStream]]. */
case class StageCompletion(
    user_id: Long, stage_idx: Int, stage: String, ts: java.sql.Timestamp)

/** Stateful-streaming face of [[graft.operators.Funnel]] — the
  * incremental formulation: per-user state is just (next stage index,
  * previous completion time), advanced by a `flatMapGroupsWithState`
  * pass that emits one [[StageCompletion]] per stage a user clears.
  *
  * Equivalence with the batch operator: processing a user's events in
  * EVENT-TIME order makes the state machine compute exactly the batch
  * chain (stage i's completion = min event time of stage i's type
  * strictly after — and optionally within `withinUs` of — stage i−1's
  * completion): the first qualifying event in time order IS that min,
  * and a pair-merge-style retroactive change is impossible because
  * earlier events are processed first. Within one batch (and within
  * one micro-batch) events are sorted here, so BATCH invocation is
  * exactly `Funnel.funnel` semantics regardless of input order —
  * q127 puts that under q113's oracle. Across micro-batches the
  * stream must deliver each user's events in event-time order (the
  * same pinned-arrival-order contract as [[IngestDedup]]); a late
  * straggler older than the user's current completion time is
  * dropped, never retroactively applied.
  *
  * Scale shape: state is two fields per ACTIVE user (users that clear
  * the last stage are evicted immediately), emissions are append-only,
  * and the report is a downstream stage-keyed count — no windows, no
  * per-user event buffering beyond the current micro-batch. The one
  * buffering point is the per-group sort inside a micro-batch (same as
  * [[EventStreams.sessionize]]'s fold): a single user's events within
  * ONE batch are materialized to sort them. Micro-batches bound that
  * in streaming; in batch mode a pathological power-user key would
  * buffer its full history — the 100 TB lever, if ever needed, is a
  * repartition+sortWithinPartitions secondary sort feeding a streaming
  * per-partition walk, which preserves these exact semantics. */
object FunnelStream {

  private def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Stage completions for `events` under `stages`. `withinUs`: the
    * optional conversion window in MICROSECONDS (mirrors
    * `Funnel.funnel(within=...)`). Same codepath for batch and
    * streaming — Spark invokes the state function per group over all
    * data in batch mode.
    *
    * `evictStalled` (streaming + `withinUs` only; input must carry a
    * watermark on ts): evict a mid-funnel user once the watermark
    * passes their conversion deadline (tUs + within). SOUND for the
    * stalled funnel itself — past the deadline no event can ever
    * qualify, so the eviction can't lose a completion — but it changes
    * long-horizon semantics to RE-ENTRY: a user who goes cold and
    * returns starts the funnel over (another stage-0 completion),
    * where the infinite-state default matches the batch single-entry
    * chain exactly. That re-entry reading is the standard product-
    * analytics one; the default stays batch-equivalent. */
  def completions(events: Dataset[FunnelEvent], stages: Seq[String],
      withinUs: Option[Long] = None,
      evictStalled: Boolean = false): Dataset[StageCompletion] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(!evictStalled || withinUs.isDefined,
      "evictStalled needs a conversion window: without one a stalled user " +
        "can still convert arbitrarily late, so eviction would drop completions")
    import events.sparkSession.implicits._
    val st = stages.toIndexedSeq
    val win = withinUs
    val timeout =
      if (evictStalled) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, StageCompletion](
        OutputMode.Append, timeout) {
        (uid, it, state) =>
          if (it.isEmpty && state.hasTimedOut) {
            // conversion deadline passed: no future event can qualify
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[StageCompletion]
            it.toSeq.sortBy(e => toMicros(e.ts)).foreach { e =>
              if (cur.stage < st.length && e.event_type == st(cur.stage)) {
                val t = toMicros(e.ts)
                val afterOk = cur.stage == 0 || t > cur.tUs
                val withinOk = cur.stage == 0 || win.forall(w => t <= cur.tUs + w)
                if (afterOk && withinOk) {
                  out += StageCompletion(uid, cur.stage, st(cur.stage), e.ts)
                  cur = FunnelProgress(cur.stage + 1, t)
                }
              }
            }
            if (cur.stage >= st.length) state.remove() // funnel done — evict
            else if (cur.stage > 0) {
              state.update(cur)
              if (evictStalled)
                // ceiling to ms, like sessionizeStreaming: flooring
                // could fire up to 1 ms before the true deadline
                state.setTimeoutTimestamp((cur.tUs + win.get + 999) / 1000)
            }
            out.iterator
          }
      }
  }

  /** The funnel report over a completion stream/frame: (stage,
    * n_users) — each user completes a stage at most once, so a plain
    * count is the user count. Stages nobody reached report 0 (seeded
    * from `stages`, matching `Funnel.funnel`'s shape and q113's
    * oracle), not a missing row. */
  def report(completions: DataFrame, stages: Seq[String]): DataFrame = {
    val spark = completions.sparkSession
    import spark.implicits._
    val all = stages.toDF("stage")
    val counts = completions.groupBy(col("stage")).agg(count(lit(1)).as("__n"))
    all.join(counts, Seq("stage"), "left")
      .select(col("stage"), coalesce(col("__n"), lit(0L)).as("n_users"))
  }
}
