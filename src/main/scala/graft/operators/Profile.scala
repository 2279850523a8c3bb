package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DATA PROFILING — the ANALYZE-style report every curation run
  * starts with: per column, row count, null count, EXACT distinct
  * count, and (where cross-engine formatting is stable) min/max.
  *
  * Scale shape: ONE pass. All metrics for all columns aggregate in a
  * single `agg` — Spark plans the multi-`countDistinct` as one Expand
  * (k× row multiplication into one shuffle) rather than k separate
  * corpus scans; that is the right trade up to a handful of profiled
  * columns, and the scaladoc'd escape hatch beyond it is
  * [[SketchStore]] (per-group HLL, one register-max pass, no Expand)
  * or `approx_count_distinct`. The aggregated single row then pivots
  * to the tall report via `stack` — driver-free, the report is
  * columns-sized.
  *
  * min/max are cast to string ONLY for integral and string columns:
  * their textual forms are identical across engines, so the report
  * stays hash-matchable (q234); float/timestamp rendering differs
  * across engines and is deliberately left null rather than
  * approximately-equal (the q-gate rounding lesson, applied to
  * formatting). */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
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
        countDistinct(col(c)).as(s"__${c}__nd")) ++ mm
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // one row -> tall: stack(k, name, nn, nd, min, max, ...)
    val stackArgs = cols.map { c =>
      s"'$c', __${c}__nn, __${c}__nd, __${c}__min, __${c}__max"
    }.mkString(", ")
    one.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, __nn, n_distinct, min_s, max_s)")
      .select(col("col_name"), col("__n").as("n"),
        (col("__n") - col("__nn")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }

  /** The 100-TB-width face of [[profile]]: identical report shape, but
    * distincts come from `approx_count_distinct` (HLL++), so the plan
    * has NO Expand — profiling k columns costs ONE ordinary
    * partial-aggregable pass over unmultiplied rows instead of a k×
    * row inflation into the shuffle. That turns column count from a
    * shuffle-volume multiplier into a constant, which is what makes
    * profiling a 200-column table over 100 TB a single cheap job.
    * Everything except `n_distinct` (n, n_null, min/max) is EXACT and
    * bit-identical to [[profile]]'s output; `n_distinct` carries the
    * estimator's documented error (rsd, default 5%). ProfileSpec pins
    * the no-Expand plan; the q240 gate pins approx-within-rsd-of-exact
    * on the fixtures alongside the exact columns' hash equality. */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "approxProfile: no columns given")
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
        approx_count_distinct(col(c), rsd).as(s"__${c}__nd")) ++ mm
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __${c}__nn, __${c}__nd, __${c}__min, __${c}__max"
    }.mkString(", ")
    one.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, __nn, n_distinct_est, min_s, max_s)")
      .select(col("col_name"), col("__n").as("n"),
        (col("__n") - col("__nn")).as("n_null"),
        col("n_distinct_est"), col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }
}
