package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Exact deduplication (reference D1+D2, src/lib.rs:64-79).
  *
  * Semantics: first-seen-wins on the bit-exact key — each f32 component
  * reinterpreted as IEEE-754 bits (src/vector.rs:25-31), so `-0.0 ≠ 0.0`
  * and distinct NaN payloads stay distinct. We do NOT reproduce the
  * reference's drop-row-0 bug (loop starts at 1, src/lib.rs:71 —
  * documented divergence, SURVEY §2.3.1).
  *
  * Scale shape: one hash-partitioned shuffle on a fixed-width BINARY key
  * + per-key min — the cheapest possible exact dedup at 100 TB. The
  * window/row_number formulation is avoided: `groupBy(key).min(ord)` +
  * semi-join back gets map-side partial aggregation, a window gets none.
  */
object Dedup {

  /** Keep the first row (lowest `ordCol`) per bit-exact vector key. */
  def exactVectors(df: DataFrame, vecCol: String, ordCol: String): DataFrame = {
    val keyed = df.withColumn("__key", floatBitsKey(col(vecCol)))
    val winners = keyed.groupBy(col("__key"))
      .agg(min(col(ordCol)).as(ordCol))
    keyed.join(winners, Seq("__key", ordCol), "left_semi").drop("__key")
  }

  /** Generic exact dedup on arbitrary key columns, first-seen-wins. */
  def exact(df: DataFrame, keyCols: Seq[String], ordCol: String): DataFrame = {
    val winners = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(ordCol)).as(ordCol))
    df.join(winners, keyCols :+ ordCol, "left_semi")
  }

  /** Dedup stats: total rows, distinct keys, duplicates removed.
    * Single-key form counts the bare column so NULL keys are excluded —
    * SQL COUNT(DISTINCT col) semantics (a struct-wrapped NULL would
    * count as its own distinct value). */
  def stats(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val distinctExpr =
      if (keyCols.size == 1) count_distinct(col(keyCols.head))
      else count_distinct(struct(keyCols.map(col): _*))
    df.agg(
      count(lit(1)).as("total_rows"),
      distinctExpr.as("distinct_keys"))
      .select(
        col("total_rows"), col("distinct_keys"),
        (col("total_rows") - col("distinct_keys")).as("duplicates"))
  }
}
