package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct (as-of) join — the feature-store primitive:
  * each left row receives the right-side values from the LATEST right
  * row with the same key and `rightTime <= leftTime`. This is how a
  * training pipeline attaches features to events without future
  * leakage; the naive equi-join + filter + per-row argmax either leaks
  * (plain join on key) or degenerates to a per-row correlated scan.
  *
  * Implementation is the union-tag merge, not a join node: tag both
  * sides, union, and run ONE key-partitioned window ordered by
  * (time, side, tiebreak) carrying `last(value, ignoreNulls)` forward.
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
  * so `rightTime == leftTime` matches — "as of" is inclusive. Among
  * right rows sharing a timestamp the greatest `rightTieBreak` wins
  * (it sorts last, and last-forward-fill keeps the last writer).
  *
  * Scale shape: exactly one shuffle (hash on key) and one
  * sort-within-partitions — the same cost as a sort-merge join, but
  * with as-of semantics a join condition cannot express without an
  * inequality-range explosion. Skewed keys behave like any windowed
  * aggregation (a hot key serializes its partition); for the known-hot
  * case, range-bucket the time axis first and run per-bucket with a
  * carried boundary row. Nothing collects to the driver.
  *
  * q16 covers the SINGLE-table as-of (prior event of the same stream);
  * this operator is the cross-table form. Left/right value column
  * names must be disjoint (no aliasing magic — callers project first).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val tagged = unionTag(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, rightTieBreak)
    val ord = mergeOrder(rightTieBreak)
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the matched row's values travel as ONE struct (null on left rows,
    // non-null on every right row even when its members are null), so a
    // genuinely-null right value comes through as null instead of being
    // individually skipped by ignoreNulls and backfilled from an OLDER
    // row — per-column fills would tear the output across rows
    val filled = tagged.withColumn("__m",
      last(col("__payload"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightVals.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** The load-bearing merge ordering every variant shares: time, then
    * right-before-left at equal times (inclusive as-of), then the
    * caller's tiebreaks ascending (last writer wins under a
    * last-forward-fill). One definition — the bucketed variant's
    * ≡-asOf contract depends on all paths sorting identically. */
  private def mergeOrder(rightTieBreak: Seq[String]): Seq[Column] =
    Seq(col("__t").asc, col("__side").asc) ++
      rightTieBreak.map(c => col(s"__r_$c").asc_nulls_first)

  /** Epoch-seconds view of a merged time value, for distance/bucket
    * arithmetic. TIMESTAMP_NTZ refuses a direct DOUBLE cast; route it
    * through TIMESTAMP first — the session timezone is pinned to UTC
    * (GraftSession.configure), so the hop is offset-free and both
    * engines derive the identical IEEE value from the same microsecond
    * integer. `dt` is the type of the unioned `__t` column. */
  private def toSec(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.TimestampNTZType => c.cast("timestamp").cast("double")
    case _ => c.cast("double")
  }

  /** Shared union-tag framing: align schemas, tag sides, drop right
    * rows with NULL time (a row whose validity time is unknown is not
    * history — treating it as "earliest" would leak it into every left
    * row with no real predecessor), and bundle the carried right fields
    * into a single nullable struct `__payload`. */
  private def unionTag(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String], rightTieBreak: Seq[String]): DataFrame = {
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val carried = rightVals ++ rightTieBreak.filterNot(rightVals.contains)
    val lSide = left.select(
      left.columns.toIndexedSeq.map(col) ++
        Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        carried.map(c => lit(null).cast(rightTypes(c)).as(s"__r_$c")): _*)
    val rSide = right.filter(col(rightTime).isNotNull).select(
      left.columns.toIndexedSeq.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        carried.map(c => col(c).as(s"__r_$c")): _*)
    lSide.unionByName(rSide).withColumn("__payload",
      when(col("__side") === 0, struct(
        (col("__t").as("__rt") +: rightVals.map(c => col(s"__r_$c").as(c))): _*)))
  }

  /** Nearest-in-time variant (pandas `merge_asof direction='nearest'`):
    * each left row gets the right row with the same key whose time is
    * CLOSEST — before or after — optionally within `toleranceSec`.
    * Equal distances prefer the backward (earlier) match; within one
    * side, backward ties pick the greatest tiebreak (consistent with
    * [[asOf]]) and forward ties the smallest (the first row the
    * forward scan meets).
    *
    * Same union-tag merge, still ONE shuffle: the backward fill
    * (`last` over preceding) and the forward fill (`first` over
    * following) are two frames of the SAME window sort, so Catalyst
    * plans one exchange + one sort and evaluates both in a single
    * Window operator. Times must be timestamps or numerics; distance
    * is |epoch seconds| (cast to double — both engines derive the
    * identical IEEE value from the underlying integer timestamp). */
  def asOfNearest(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      toleranceSec: Option[Double] = None): DataFrame = {
    val tagged = unionTag(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, rightTieBreak)
    val ord = mergeOrder(rightTieBreak)
    val base = Window.partitionBy(col("__k")).orderBy(ord: _*)
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(1, Window.unboundedFollowing)

    // both direction fills move the matched row's (time, values) as ONE
    // struct — same atomicity argument as asOf: the candidate the
    // tolerance check validates IS the candidate whose values are
    // returned, never a column-wise mix of different rows
    val filled = tagged
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(back))
      .withColumn("__f", first(col("__payload"), ignoreNulls = true).over(fwd))

    val tDt = tagged.schema("__t").dataType
    val lt = toSec(col("__t"), tDt)
    val bDist = abs(lt - toSec(col("__b.__rt"), tDt))
    val fDist = abs(toSec(col("__f.__rt"), tDt) - lt)
    val bOk = col("__b").isNotNull &&
      toleranceSec.map(t => bDist <= t).getOrElse(lit(true))
    val fOk = col("__f").isNotNull &&
      toleranceSec.map(t => fDist <= t).getOrElse(lit(true))
    val useBack = bOk && (!fOk || bDist <= fDist)  // tie -> backward
    val picked = rightVals.foldLeft(filled) { (df, c) =>
      df.withColumn(c,
        when(useBack, col(s"__b.$c")).when(fOk, col(s"__f.$c")))
    }
    picked.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++ rightVals.map(col): _*)
  }

  /** Skew-hardened as-of: identical result to [[asOf]], but the window
    * partitions by (key, time-bucket) instead of key alone, so ONE hot
    * key no longer serializes through a single task — parallelism
    * scales with the time axis. Mechanics:
    *
    *   1. every row lands in bucket ⌊epoch(t) / bucketSeconds⌋;
    *   2. the per-(key, bucket) merge runs exactly [[asOf]]'s fill —
    *      but it can only see in-bucket history;
    *   3. a BOUNDARY table seeds each bucket with the last right
    *      payload from all EARLIER buckets: one row per (key, bucket)
    *      — aggregate-sized, not row-sized — built with max_by per
    *      bucket and a cumulative last() over the tiny per-bucket
    *      frame, then joined back and coalesced under the in-bucket
    *      fill (any in-bucket predecessor is strictly later than every
    *      earlier-bucket row, so coalesce order IS time order).
    *
    * Cost: one extra small shuffle over the per-bucket aggregates and
    * one broadcast-sized join. Pick bucketSeconds so a hot key spreads
    * over many buckets while typical keys keep a handful. Equality
    * with [[asOf]] on random data at several widths is property-
    * pinned. */
  def asOfBucketed(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0: $bucketSeconds")
    val tagged0 = unionTag(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, rightTieBreak)
    val tagged = tagged0.withColumn("__bkt",
      floor(toSec(col("__t"), tagged0.schema("__t").dataType) / bucketSeconds).cast("long"))

    // boundary: last right payload per (key, bucket), carried forward
    // across EVERY occupied bucket (left- or right-occupied — a bucket
    // holding only left rows still needs earlier history), exclusive of
    // the bucket itself. Window over per-bucket aggregates: cardinality
    // = occupied buckets per key, not rows per key.
    val ordCols: Seq[Column] =
      col("__t") +: rightTieBreak.map(c => col(s"__r_$c"))
    val perBucket = tagged.filter(col("__side") === 0)
      .groupBy(col("__k"), col("__bkt"))
      .agg(max_by(col("__payload"), struct(ordCols: _*)).as("__last"))
    val occupied = tagged.select(col("__k"), col("__bkt")).distinct()
    val wBkt = Window.partitionBy(col("__k")).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe here as well: a plain Seq-join would detach null-key
    // perBucket rows from their occupied buckets
    val boundary = occupied
      .join(perBucket.withColumnRenamed("__k", "__pk")
          .withColumnRenamed("__bkt", "__pbkt"),
        col("__k") <=> col("__pk") && col("__bkt") === col("__pbkt"), "left")
      .withColumn("__seed", last(col("__last"), ignoreNulls = true).over(wBkt))
      .select(col("__k"), col("__bkt"), col("__seed"))

    val ord = mergeOrder(rightTieBreak)
    val w = Window.partitionBy(col("__k"), col("__bkt")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-SAFE key equality: window partitioning groups null keys
    // together (asOf semantics), so the boundary lookup must too — a
    // plain equi-join would drop every null-key row's history
    val filled = tagged
      .withColumn("__m_in", last(col("__payload"), ignoreNulls = true).over(w))
      .join(boundary.withColumnRenamed("__k", "__bk")
          .withColumnRenamed("__bkt", "__bbkt"),
        col("__k") <=> col("__bk") && col("__bkt") === col("__bbkt"), "left")
      // any in-bucket predecessor is strictly later than every earlier-
      // bucket row, so coalesce order IS time order
      .withColumn("__m", coalesce(col("__m_in"), col("__seed")))
    filled.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightVals.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Streaming face: enrich a STREAM of left rows point-in-time against
    * a static (or slowly-rebuilt standing) right table. Because each
    * left row's match depends only on the right side — never on other
    * left rows — running [[asOf]] per micro-batch is EXACTLY the batch
    * semantics regardless of how the stream is batched (the same
    * batching-independence argument as IngestDedup, but trivially: no
    * seen-store). foreachBatch rather than a stream-stream join: the
    * as-of pick is a per-key argmax, which Structured Streaming's join
    * conditions cannot express without emitting every ≤-pair. */
  def asOfStream(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      rightTieBreak: Seq[String],
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    left.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(asOf(batch, right, leftKey, rightKey, leftTime, rightTime,
          rightVals, rightTieBreak), batchId)
      }
}
