package graft

import org.apache.spark.sql.functions._

/** Pins a Spark 4.1 planner hazard found while building the NB/LM
  * federated merges (round 14): a UNION of two IDENTICALLY-BUCKETED
  * table scans followed by groupBy on keys containing the bucket key
  * is planned WITHOUT the merging exchange — partial aggregates from
  * the two sides land in different partitions (union concatenates, it
  * does not zip buckets) and the "final" aggregate runs
  * partition-locally, so the result contains duplicate groups (one per
  * side). Even a plain `.collect()` is wrong; no write path involved.
  *
  * Engine-wide rule this spec enforces: any union of two co-bucketed
  * catalog tables that feeds an aggregation must carry an explicit
  * `.repartition(keys)` (the shuffle a correct plan requires anyway —
  * zero extra cost). The store⊕store merges (NbStore.mergeStores,
  * LmStore.mergeStores) are the only such sites; the batch⊕store
  * merges never hit it because the delta side is unbucketed, which
  * forces the exchange.
  */
class BucketedUnionHazardSpec extends SparkSpec {
  import spark.implicits._

  private def mk(): Unit = {
    for (t <- Seq("dbg_a", "dbg_b"))
      graft.sources.Sinks.dropTable(spark, t)
    val a = Seq(("en", "the", 1L), ("en", "cat", 2L)).toDF("label", "token", "cnt")
    val b = Seq(("en", "the", 1L), ("fr", "chat", 1L)).toDF("label", "token", "cnt")
    graft.sources.Sinks.parquetBucketed(a, "dbg_a", 2, Seq("token"), Seq("token"))
    graft.sources.Sinks.parquetBucketed(b, "dbg_b", 2, Seq("token"), Seq("token"))
  }

  test("the hazard is real on this Spark: co-bucketed union + groupBy drops the exchange") {
    mk()
    val naive = spark.table("dbg_a").unionByName(spark.table("dbg_b"))
      .groupBy(col("label"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect()
    // if a Spark upgrade fixes the plan, this canary flips and the
    // workaround (and this spec) can be retired
    assert(naive.count(r => r.getString(1) == "the") === 2,
      "Spark now merges co-bucketed union aggregates correctly — " +
        "retire the explicit repartitions in NbStore/LmStore.mergeStores")
  }

  test("explicit repartition restores correctness (the mergeStores workaround)") {
    mk()
    val fixed = spark.table("dbg_a").unionByName(spark.table("dbg_b"))
      .repartition(col("label"), col("token"))
      .groupBy(col("label"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect()
    assert(fixed.length === 3)
    assert(fixed.find(_.getString(1) == "the").get.getLong(2) === 2L)
  }
}
