package graft.tools

import org.apache.spark.sql.functions._

/** One-shot probe: how far apart are a maintained (unioned) HLL
  * estimate and a fresh single-pass sketch of the same set, as
  * cardinality crosses the sparse→dense boundary? DataSketches serves
  * the HIP estimator from a directly-built sketch but only the
  * composite estimator from a merged dense one, so exact estimate
  * equality is a SPARSE-MODE property — this probe measures the dense
  * divergence that q231's gate bound must honestly cover.
  * Run: sbt "runMain graft.tools.ProbeHllDivergence". */
object ProbeHllDivergence {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    for (n <- Seq(500L, 2000L, 10000L, 100000L, 1000000L)) {
      val ids = spark.range(n).select(lit("g").as("grp"), col("id"))
      val fresh = ids.groupBy(col("grp"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("id"), lit(12))).as("e"))
        .head().getLong(1)
      val waves = (0 until 3).map { w =>
        ids.filter(col("id") % 3 === w).groupBy(col("grp"))
          .agg(hll_sketch_agg(col("id"), lit(12)).as("sk"))
      }
      val merged = waves.reduce(_ unionByName _)
        .groupBy(col("grp")).agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
        .select(hll_sketch_estimate(col("sk"))).head().getLong(0)
      val rel = math.abs(merged - fresh).toDouble / fresh
      println(f"PROBE_HLL n=$n%8d fresh=$fresh%8d merged=$merged%8d rel_diff=$rel%.5f exact_err_fresh=${math.abs(fresh - n).toDouble / n}%.5f exact_err_merged=${math.abs(merged - n).toDouble / n}%.5f")
    }
    spark.stop()
  }
}
