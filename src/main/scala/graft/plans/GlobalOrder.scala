package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global positions WITHOUT a global window: `row_number().over
  * (Window.orderBy(…))` shuffles every row to ONE task (the
  * anti-pattern [[graft.operators.RankFusion]] documents); this helper
  * instead runs Spark's range-partitioned `sort` (parallel) and
  * assigns positions with `zipWithIndex`'s per-partition-offset pass
  * (one count job + one narrow map — the
  * [[graft.sources.VecReader]] pattern). Used by every operator whose
  * OUTPUT is a full total order (curriculum phases, epoch schedules),
  * where [[RankFusion]]'s top-k shortcut doesn't apply because every
  * row needs its rank. */
object GlobalOrder {

  /** `df` sorted by `sortCols` with a 1-based `__pos` LongType column
    * appended. The sort must be total (add an id tie-break) or
    * positions are only deterministic up to ties. */
  def withPositions(df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(sortCols: _*)
    val schema = sorted.schema.add("__pos", LongType)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
  }
}
