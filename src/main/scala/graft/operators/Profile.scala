package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DATA PROFILING — the ANALYZE-style report every curation run
  * starts with: per column, row count, null count, distinct count,
  * and (where cross-engine formatting is stable) min/max.
  *
  * Two faces over ONE shared report builder (they may not drift —
  * the exact columns must stay bit-identical between them, q240):
  *
  *  - [[profile]] — EXACT distincts. One pass: Spark plans the
  *    multi-`countDistinct` as one Expand (k× row multiplication into
  *    one shuffle) rather than k corpus scans; right up to a handful
  *    of profiled columns.
  *  - [[approxProfile]] — `approx_count_distinct` (HLL++). NO Expand:
  *    all k columns aggregate over UNMULTIPLIED rows, so column count
  *    stops being a shuffle-volume multiplier — the shape that
  *    profiles a 200-column table at 100 TB. Everything except the
  *    distinct estimate (n, n_null, min/max) is exact and
  *    bit-identical to [[profile]]'s output.
  *
  * min/max are cast to string ONLY for integral and string columns:
  * their textual forms are identical across engines, so the report
  * stays hash-matchable (q234); float/timestamp rendering differs
  * across engines and is deliberately left null rather than
  * approximately-equal (the q-gate rounding lesson, applied to
  * formatting). */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    report(df, cols, c => countDistinct(col(c)), "n_distinct")

  /** See the object scaladoc; `rsd` is the HLL++ relative standard
    * deviation (default 5%). ProfileSpec/PlanSpec pin the no-Expand
    * plan; the q240 gate pins approx-within-rsd-of-exact on the
    * fixtures alongside the exact columns' hash equality. */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    report(df, cols, c => approx_count_distinct(col(c), rsd),
      "n_distinct_est")

  /** The shared builder: one `agg` carrying all metrics for all
    * columns, then the stack pivot to the tall report (driver-free,
    * columns-sized). Only the distinct aggregate differs per face. */
  private def report(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column, distinctName: String): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val schema = df.schema
    def minMaxable(c: String): Boolean = schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    val aggs = cols.flatMap { c =>
      val mm =
        if (minMaxable(c))
          Seq(min(col(c)).cast("string").as(s"__${c}__min"),
            max(col(c)).cast("string").as(s"__${c}__max"))
        else
          Seq(lit(null).cast("string").as(s"__${c}__min"),
            lit(null).cast("string").as(s"__${c}__max"))
      Seq(count(col(c)).as(s"__${c}__nn"),
        distinctAgg(c).as(s"__${c}__nd")) ++ mm
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // one row -> tall: stack(k, name, nn, nd, min, max, ...)
    val stackArgs = cols.map { c =>
      s"'$c', __${c}__nn, __${c}__nd, __${c}__min, __${c}__max"
    }.mkString(", ")
    one.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, __nn, $distinctName, min_s, max_s)")
      .select(col("col_name"), col("__n").as("n"),
        (col("__n") - col("__nn")).as("n_null"),
        col(distinctName), col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }
}
