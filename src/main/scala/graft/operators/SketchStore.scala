package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STANDING DISTINCT-COUNT SKETCHES — per-group HLL (HyperLogLog,
  * Flajolet et al. 2007, as implemented by Apache DataSketches behind
  * Spark's `hll_sketch_agg` family; the HIP estimator asymmetry noted
  * below is Ting 2014 / the DataSketches HIP documentation)
  * maintained across ingest waves
  * under the CountStore lifecycle (the NbStore/LmStore/SampleStore
  * discipline: `__building` torn-write marker, `_applied` batch
  * ledger, fail-loud serve guard).
  *
  * Why a sketch store is the 100 TB shape for COUNT(DISTINCT …): the
  * exact form needs the distinct key set per group — state
  * proportional to the DATA; the sketch needs 2^lgK bytes per group —
  * state proportional to the GROUPS, and maintenance is a
  * register-wise max (one tiny merge per wave, no corpus re-scan, no
  * raw-id retention — which also matters when ids are user
  * identifiers a standing store should not keep). HLL union is
  * register-wise max, so maintained-across-waves ≡ sketched-fresh at
  * the REGISTER level by construction — Spark's own partial
  * aggregation already computes `hll_sketch_agg` as a union of
  * per-partition sketches, so the wave split is the same operation at
  * a coarser grain. The served ESTIMATES, however, are only
  * near-equal once sketches go dense: DataSketches serves the HIP
  * estimator from a directly-built sketch but only the composite
  * estimator from a merged dense one, so exact estimate equality is a
  * sparse-mode property (measured: equality below ~1k distincts/group,
  * ≤0.4% relative gap in the sparse→dense crossing band, 0 again at
  * 10⁴–10⁶ — ProbeHllDivergence; q231 gates maintained-within-1%-of-
  * fresh plus both-within-5%-of-exact).
  *
  * Store layout: `<name>_hll` (grp string, sk binary) — one row per
  * group; `<name>_hll_params` (lg_k int). All corpus-sized passes are
  * one partial-agg-friendly groupBy; every store-sized pass is
  * groups-sized.
  *
  * TAKEDOWN LIMITATION (stated, not hidden): HLL registers are
  * monotone — union-only, not invertible — so this store cannot
  * honor a purge list in place the way the count/sample/index stores
  * do. Takedown semantics = [[initStore]] over the retained corpus
  * (one pass, the same cost as the original build); anything subtler
  * (e.g. per-wave sketch retention for bounded rewind) buys
  * complexity the distinct-count use case doesn't need. */
object SketchStore {

  def initStore(docs: DataFrame, name: String, grpCol: String,
      idCol: String, lgK: Int = 12): Unit = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    val spark = docs.sparkSession
    CountStore.setBuilding(spark, name, on = true)
    CountStore.dropLedger(spark, name)
    CountStore.clearStale(spark, name)
    // disjoint outputs — overlap the sketch write with the 1-row
    // params write (r14, guide §2.6)
    graft.util.Par.run(
      () => graft.sources.Sinks.parquetTable(
        sketched(docs, grpCol, idCol, lgK), s"${name}_hll"),
      () => graft.sources.Sinks.parquetTable(
        spark.range(1).select(lit(lgK).as("lg_k")), s"${name}_hll_params"))
    CountStore.setBuilding(spark, name, on = false)
  }

  /** One wave: sketch the batch per group, register-max into the
    * store (full outer union-agg keeps groups first seen in either
    * side). Returns false on a re-delivered batch id. */
  def applyBatch(batch: DataFrame, name: String, grpCol: String,
      idCol: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    CountStore.requireServable(spark, name)
    if (CountStore.alreadyApplied(spark, name, batchId)) false
    else {
      val merged = mergedWith(batch, name, grpCol, idCol)
      CountStore.applyOnce(spark, name, batchId) {
        graft.sources.Sinks.parquetTable(merged, s"${name}_hll")
      }
    }
  }

  /** Ledger-FREE register-max merge — the admission fold's put-side
    * op (the fold carries its own batch ledger). */
  def mergeDocs(batch: DataFrame, name: String, grpCol: String,
      idCol: String): Unit = {
    val spark = batch.sparkSession
    CountStore.requireServable(spark, name)
    graft.sources.Sinks.parquetTable(
      mergedWith(batch, name, grpCol, idCol), s"${name}_hll")
  }

  private def mergedWith(batch: DataFrame, name: String, grpCol: String,
      idCol: String): DataFrame = {
    val spark = batch.sparkSession
    val lgK = lgKOf(spark, name)
    spark.table(s"${name}_hll")
      .unionByName(sketched(batch, grpCol, idCol, lgK))
      .groupBy(col("grp"))
      .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
      .localCheckpoint() // settle BEFORE overwriting what we read
  }

  /** FEDERATED store merge (round 13, the HhStore.mergeStores
    * discipline): two standing HLL stores → one, via register-wise
    * max over the groups-sized sketch tables — NO corpus read on
    * either side. HLL union is exactly what Spark's partial
    * aggregation already does per wave, so merged-at-the-coordinator
    * ≡ sketched-on-one-cluster at the REGISTER level; the served
    * estimates carry the documented sparse/dense HIP-vs-composite
    * asymmetry (scaladoc above). Sides must share lgK (a mixed-lgK
    * union silently downgrades the finer side). Staleness contract
    * (r13 advice): the merged store INHERITS the union backlog
    * ([[CountStore.mergeStale]]) — no laundering through a merge. */
  def mergeStores(spark: SparkSession, a: String, b: String,
      out: String): Unit = {
    CountStore.requireServable(spark, a)
    CountStore.requireServable(spark, b)
    require(out != a && out != b,
      s"mergeStores: output '$out' must be a third store — merging " +
        "into a side would overwrite tables while reading them")
    val (la, lb) = (lgKOf(spark, a), lgKOf(spark, b))
    require(la == lb,
      s"mergeStores: lgK differs ($a has $la, $b has $lb)")
    CountStore.setBuilding(spark, out, on = true)
    CountStore.dropLedger(spark, out)
    CountStore.mergeStale(spark, a, b, out)
    graft.sources.Sinks.parquetTable(
      spark.table(s"${a}_hll").unionByName(spark.table(s"${b}_hll"))
        .groupBy(col("grp"))
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk")),
      s"${out}_hll")
    graft.sources.Sinks.parquetTable(
      spark.range(1).select(lit(la).as("lg_k")), s"${out}_hll_params")
    CountStore.setBuilding(spark, out, on = false)
  }

  def maintainStream(docs: DataFrame, name: String, grpCol: String,
      idCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          applyBatch(batch, name, grpCol, idCol, batchId); ()
        }
      }

  /** Serve: (grp, n_distinct_est). Groups-sized scan, no raw data. */
  def estimate(spark: SparkSession, name: String): DataFrame = {
    CountStore.requireServable(spark, name)
    spark.table(s"${name}_hll")
      .select(col("grp"),
        hll_sketch_estimate(col("sk")).as("n_distinct_est"))
  }

  /** Serve-with-staleness-bound (r12 verdict #4): refresh-then-serve
    * when the deferred-takedown backlog exceeds `maxStale` batches. */
  def estimate(spark: SparkSession, name: String, maxStale: Int,
      refresh: () => Unit): DataFrame = {
    CountStore.serveWithin(spark, name, maxStale, refresh)
    estimate(spark, name)
  }

  /** DISTINCT-COUNT drift across two standing stores (round 14 — the
    * third member of the drift trio beside [[QuantileStore.drift]] and
    * [[HhStore.drift]]): "did domain X's distinct-user/URL count move
    * between snapshot A and snapshot B" as a groups-sized full-outer
    * join of two standing sketch tables — no corpus read on either
    * side. Serves both estimates and the signed delta; groups present
    * on one side only keep the other side's columns NULL (a new or
    * vanished domain IS drift signal — the q256 convention; unlike
    * [[HhStore.drift]]'s counters there is no exact-zero reading of an
    * absent HLL sketch, so null is the honest value). Estimates carry
    * the HLL error envelope (sparse-regime exactness / dense ~1.6% at
    * lgK 12, scaladoc above), which is why this face has no hash gate:
    * the family's estimate-vs-exact policy is q168/q231's 5% bits and
    * the spec pins drift ≡ estimate(b) − estimate(a) pointwise. */
  def drift(spark: SparkSession, nameA: String, nameB: String): DataFrame = {
    CountStore.requireServable(spark, nameA)
    CountStore.requireServable(spark, nameB)
    val a = estimate(spark, nameA)
      .withColumnRenamed("n_distinct_est", "est_a")
    val b = estimate(spark, nameB)
      .withColumnRenamed("n_distinct_est", "est_b")
    a.join(b, Seq("grp"), "full_outer")
      .select(col("grp"), col("est_a"), col("est_b"),
        (col("est_b") - col("est_a")).as("delta_est"),
        when(col("est_a").isNull, lit("new"))
          .when(col("est_b").isNull, lit("vanished"))
          .otherwise(lit("both")).as("status"))
  }

  /** Operational introspection (the describeStore discipline). */
  def describeStore(spark: SparkSession, name: String): DataFrame =
    CountStore.describe(spark, name, Map(
      "n_groups" -> (s"${name}_hll", count(lit(1))),
      "sketch_bytes" -> (s"${name}_hll", sum(length(col("sk")))),
      "lg_k" -> (s"${name}_hll_params", sum(col("lg_k")))))

  private[graft] def lgKOf(spark: SparkSession, name: String): Int =
    spark.table(s"${name}_hll_params").head().getAs[Int]("lg_k")

  private def sketched(df: DataFrame, grpCol: String, idCol: String,
      lgK: Int): DataFrame =
    df.select(col(grpCol).cast("string").as("grp"), col(idCol).as("id"))
      .groupBy(col("grp"))
      .agg(hll_sketch_agg(col("id"), lit(lgK)).as("sk"))
}
