package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-stage ordered funnel — the parameterized generalization of the
  * view→click→purchase analysis (q113). A user completes stage i when
  * an event of stage i's type exists STRICTLY AFTER the user's stage
  * i−1 completion time; completion time is the MIN qualifying event
  * time (the canonical "earliest conversion" semantics — later
  * repetitions of a stage neither help nor hurt).
  *
  * Plan shape (the reason this is an iterative chain and not a
  * sequence-match window): each stage is one semi-filtered scan of the
  * events table joined to the PREVIOUS stage's per-user min-time — a
  * user-keyed aggregation whose build side shrinks monotonically (the
  * funnel property), so every join after stage 1 is against an
  * ever-smaller per-user frame and AQE broadcasts the tail stages. No
  * window over per-user event sequences, no array materialization:
  * corpus-sized work is `stages.length` filtered scans + hash aggs,
  * each separately shuffle-partial. PlanSpec pins the window-free
  * shape via q113, which is this operator at
  * `Seq("view", "click", "purchase")`.
  */
object Funnel {

  /** Per-user completion times: (userCol, __t) for the LAST stage,
    * chaining through all previous ones. Exposed for reuse (e.g.
    * time-to-convert analyses join two stages' frames).
    *
    * `within`: optional CONVERSION WINDOW — stage i only counts when it
    * happens within this interval of the stage i−1 completion time
    * (strictly after it, at most `within` later). The standard product-
    * analytics semantics ("converted within 7 days"); pass a Spark
    * interval expression string like `"INTERVAL 7 DAYS"`. The gate
    * stays a per-row filter on the same joined frame — the plan shape
    * does not change. NOTE the semantics stay min-FIRST-qualifying:
    * completion time is the earliest event inside the window of the
    * previous stage's completion, not of any earlier event. */
  def stageTimes(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      within: Option[String] = None): Seq[(String, DataFrame)] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val bound = within.map(expr)
    var prev: Option[DataFrame] = None
    stages.map { st =>
      val base = events.filter(col(typeCol) === st)
      val gated = prev match {
        case None => base
        case Some(p) =>
          val joined = base.join(p.select(col(userCol), col("__t")), Seq(userCol))
            .filter(col(tsCol) > col("__t"))
          bound.fold(joined)(b => joined.filter(col(tsCol) <= col("__t") + b))
      }
      val cur = gated.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      prev = Some(cur)
      (st, cur)
    }
  }

  /** Per-transition conversion timing: for each consecutive stage pair
    * (s_{i-1} → s_i), the number of converting users and the EXACT
    * integer sum of conversion lags in microseconds (sum + count
    * instead of an average — all-integer output survives any engine's
    * float path; avg is one division away). Stage-i users are a subset
    * of stage-(i−1) users by construction, so the per-pair join build
    * side is the already-tiny later frame. Timestamps route through
    * TIMESTAMP (`unix_micros(cast ...)`") so NTZ fixture columns work. */
  def conversionLags(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      within: Option[String] = None): DataFrame = {
    require(stages.length >= 2, "conversion lags need at least two stages")
    val frames = stageTimes(events, stages, userCol, tsCol, typeCol, within)
    frames.sliding(2).map { case Seq((s1, f1), (s2, f2)) =>
      f1.select(col(userCol), expr("unix_micros(cast(__t as timestamp))").as("__t1"))
        .join(f2.select(col(userCol), expr("unix_micros(cast(__t as timestamp))").as("__t2")),
          Seq(userCol))
        .agg(count(lit(1)).as("n_converted"),
          coalesce(sum(col("__t2") - col("__t1")), lit(0L)).as("sum_micros"))
        .select(lit(s1).as("from_stage"), lit(s2).as("to_stage"),
          col("n_converted"), col("sum_micros"))
    }.reduce(_.unionAll(_))
  }

  /** The funnel report: one (stage, n_users) row per stage, in the
    * caller's stage order (sort on output if a different presentation
    * order is wanted — q113 sorts by stage name for its oracle). */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      within: Option[String] = None): DataFrame =
    stageTimes(events, stages, userCol, tsCol, typeCol, within)
      .map { case (st, cur) =>
        cur.agg(count(lit(1)).as("n_users"))
          .select(lit(st).as("stage"), col("n_users"))
      }
      .reduce(_.unionAll(_))
}
