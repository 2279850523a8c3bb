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
    * fixtures alongside the exact columns' hash equality.
    *
    * `quantiles` (round-12): per requested probability, one extra
    * report column (named by the QuantileStore convention — `p50`,
    * `p95`) holding the KLL-sketched quantile for NUMERIC columns and
    * null for the rest (the min/max discipline applied to
    * percentiles). `kll_sketch_agg` composes into the same one-pass
    * agg — no extra scan, still no Expand (PlanSpec) — so the
    * length/score distribution lands in the same ANALYZE report the
    * Drift surface consumes. Quantiles ride the q248 rank-window
    * policy (KLL compaction is randomized), while every other column
    * stays bit-identical to the quantile-free report. */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05, quantiles: Seq[Double] = Nil): DataFrame =
    report(df, cols, c => approx_count_distinct(col(c), rsd),
      "n_distinct_est", quantiles)

  /** The shared builder: one `agg` carrying all metrics for all
    * columns, then the stack pivot to the tall report (driver-free,
    * columns-sized). Only the distinct aggregate differs per face. */
  private def report(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column, distinctName: String,
      quantiles: Seq[Double] = Nil): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    require(quantiles.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile probs must be in [0, 1], got $quantiles")
    val qNames = quantiles.map(QuantileStore.quantileName)
    require(qNames.distinct.size == qNames.size,
      s"quantile probs $quantiles collide in derived names $qNames")
    val schema = df.schema
    def minMaxable(c: String): Boolean = schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    def numeric(c: String): Boolean =
      schema(c).dataType.isInstanceOf[NumericType]
    val aggs = cols.flatMap { c =>
      val mm =
        if (minMaxable(c))
          Seq(min(col(c)).cast("string").as(s"__${c}__min"),
            max(col(c)).cast("string").as(s"__${c}__max"))
        else
          Seq(lit(null).cast("string").as(s"__${c}__min"),
            lit(null).cast("string").as(s"__${c}__max"))
      val qs = quantiles.zipWithIndex.map { case (p, i) =>
        (if (numeric(c))
          QuantileStore.kllQuantile(
            QuantileStore.kllSketchAgg(col(c).cast("double")), lit(p))
        else max(lit(null).cast("double"))).as(s"__${c}__q$i")
      }
      Seq(count(col(c)).as(s"__${c}__nn"),
        distinctAgg(c).as(s"__${c}__nd")) ++ mm ++ qs
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // one row -> tall: stack(k, name, nn, nd, min, max, q..., ...)
    val qIdx = quantiles.indices.map(i => s"__q$i")
    val stackArgs = cols.map { c =>
      (s"'$c'" +: Seq("__nn", "__nd", "__min", "__max").map(s => s"__${c}$s")
        ++: qIdx.map(s => s"__${c}$s")).mkString(", ")
    }.mkString(", ")
    val outNames = Seq("col_name", "__nn", distinctName, "min_s", "max_s") ++
      qNames
    one.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (${outNames.mkString(", ")})")
      .select(col("col_name") +: col("__n").as("n") +:
        (col("__n") - col("__nn")).as("n_null") +:
        col(distinctName) +: col("min_s") +: col("max_s") +:
        qNames.map(col): _*)
      .orderBy(col("col_name"))
  }
}
