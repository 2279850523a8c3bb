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
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val carried = rightVals ++ rightTieBreak.filterNot(rightVals.contains)

    val lSide = left.select(
      left.columns.map(col) ++
        Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        carried.map(c => lit(null).cast(rightTypes(c)).as(s"__r_$c")): _*)
    val rSide = right.select(
      left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        carried.map(c => col(c).as(s"__r_$c")): _*)

    val ord: Seq[Column] =
      Seq(col("__t").asc, col("__side").asc) ++
        rightTieBreak.map(c => col(s"__r_$c").asc_nulls_first)
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightVals.foldLeft(lSide.unionByName(rSide)) { (df, c) =>
      df.withColumn(c, last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ rightVals.map(col): _*)
  }
}
