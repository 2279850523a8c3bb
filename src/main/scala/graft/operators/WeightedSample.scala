package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** Deterministic weighted sampling without replacement, per key — the
  * Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters 2006): give each
  * row the key u^(1/w) for u uniform in (0, 1] and keep the k largest
  * per group. Inclusion probability is proportional to weight, and the
  * whole draw is ONE pass + a bounded per-key heap — the way a training
  * pipeline takes a length-weighted document sample per language
  * without a global sort or a sequential scan.
  *
  * Determinism: u derives from the same integer hash the engine's other
  * sampling ops use (q47/q49/q72's multiplicative hash — portable
  * integer arithmetic, identical in any engine), shifted into (0, 1] so
  * pow is defined at every row. Priorities are rounded to 6 decimals
  * before ranking: Spark's java.lang.Math.pow and another engine's
  * libm may differ in the last ulp, and the round puts both on the
  * same grid (ties then break by id — total order).
  *
  * Scale: no shuffle before the heap prune — the partial TopKPerKey
  * pass cuts every map partition to k rows per key, so only
  * partitions×k rows reach the key-clustered exchange. Weights need
  * not be normalized; zero/negative weights are rejected rather than
  * silently reordered (u^(1/w) is monotone-in-u only for w > 0). */
object WeightedSample {

  /** Uniform in (0, 1] from the portable integer hash of `id`. */
  def uniform(id: Column): Column =
    (pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(4294967296L)) + 1) /
      lit(4294967297.0)

  /** ES priority: u(id)^(1/w), rounded to the cross-engine grid. */
  def priority(id: Column, weight: Column): Column =
    round(pow(uniform(id), lit(1.0) / weight), 6)

  /** k rows per key, ranked 1..k by descending priority (ties by id).
    * Output = input columns + `rank`. */
  def perKey(df: DataFrame, keyCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    // u^(1/w) is monotone-in-u only for w > 0 — fail loudly, not
    // reorder silently. The assert lives INSIDE the ranking column (a
    // dropped check column would be pruned as dead code); it yields
    // null on pass, so the coalesce adds exactly 0.0.
    val guarded = -priority(col(idCol), col(weightCol)) +
      coalesce(assert_true(col(weightCol) > 0,
        lit(s"WeightedSample: $weightCol must be > 0")).cast("double"), lit(0.0))
    val withP = df.withColumn("__negp", guarded)
    val pruned = TopKPerKey.perKey(withP, Seq(keyCol), Seq("__negp", idCol), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__negp"), col(idCol))
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__negp")
  }
}
