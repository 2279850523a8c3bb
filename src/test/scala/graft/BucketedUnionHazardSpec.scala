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
  * A `.repartition(bucketKey)` between the union and the groupBy is
  * NOT a reliable workaround: whenever `spark.sql.shuffle.partitions`
  * equals the tables' bucket count, the planner treats the repartition
  * as a no-op against the union's (falsely) claimed partitioning and
  * elides it — the third test pins that elision (this session's conf:
  * shuffle.partitions = 8, so buckets = 8 is the hazardous match).
  *
  * Engine-wide rule these tests enforce: merging two co-bucketed
  * catalog tables by key goes through a FULL-OUTER co-bucketed JOIN
  * (the legitimate bucket-pairing path — zero shuffle, exact), never
  * union+groupBy. The store⊕store merges (NbStore / LmStore
  * .mergeStores, Bm25.mergeIndexes' df table) do exactly that; the
  * batch⊕store merges never hit the hazard because the delta side is
  * unbucketed, which forces the exchange.
  */
class BucketedUnionHazardSpec extends SparkSpec {
  import spark.implicits._

  // buckets == spark.sql.shuffle.partitions (8 in SparkSpec) — the
  // conf where the repartition workaround silently dies
  private val B = 8

  private def mk(): Unit = {
    for (t <- Seq("dbg_a", "dbg_b"))
      graft.sources.Sinks.dropTable(spark, t)
    val a = Seq(("en", "the", 1L), ("en", "cat", 2L)).toDF("label", "token", "cnt")
    val b = Seq(("en", "the", 1L), ("fr", "chat", 1L)).toDF("label", "token", "cnt")
    graft.sources.Sinks.parquetBucketed(a, "dbg_a", B, Seq("token"), Seq("token"))
    graft.sources.Sinks.parquetBucketed(b, "dbg_b", B, Seq("token"), Seq("token"))
  }

  test("the hazard is real on this Spark: co-bucketed union + groupBy drops the exchange") {
    mk()
    val naive = spark.table("dbg_a").unionByName(spark.table("dbg_b"))
      .groupBy(col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect()
    // if a Spark upgrade fixes the plan, this canary flips and the
    // join workaround (and this spec) can be retired
    assert(naive.count(_.getString(0) == "the") === 2,
      "Spark now merges co-bucketed union aggregates correctly — " +
        "retire the full-outer-join merges in NbStore/LmStore/Bm25")
  }

  test("repartition(bucketKey) is ELIDED when shuffle.partitions == buckets — not a workaround") {
    mk()
    assert(spark.conf.get("spark.sql.shuffle.partitions") === B.toString,
      "precondition: this spec pins the matching-count conf")
    val reparted = spark.table("dbg_a").unionByName(spark.table("dbg_b"))
      .repartition(col("token"))
      .groupBy(col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect()
    assert(reparted.count(_.getString(0) == "the") === 2,
      "Spark now keeps the user repartition over a co-bucketed union — " +
        "the elision this spec documents no longer happens")
  }

  test("the workaround: FULL-OUTER co-bucketed join merges exactly") {
    mk()
    val joined = spark.table("dbg_a").withColumnRenamed("cnt", "ca")
      .join(spark.table("dbg_b").withColumnRenamed("cnt", "cb"),
        Seq("label", "token"), "full_outer")
      .select(col("label"), col("token"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("cnt"))
      .collect()
    assert(joined.length === 3)
    assert(joined.find(_.getString(1) == "the").get.getLong(2) === 2L)
    assert(joined.find(_.getString(1) == "cat").get.getLong(2) === 2L)
    assert(joined.find(_.getString(1) == "chat").get.getLong(2) === 1L)
  }
}
