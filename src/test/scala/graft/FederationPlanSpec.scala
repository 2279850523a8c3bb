package graft

import org.apache.spark.sql.functions._

/** Plan shapes of the round-14 federation paths — perf contracts as
  * tests (the PlanSpec discipline): the co-bucketed df merge must be
  * exchange-free on the scan sides (bucket pairing, not a shuffle),
  * and the federated ANN merge must keep the per-shard serves'
  * cell-pruned scans (the candidate-generation pruning survives the
  * union + top-k tail). */
class FederationPlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("co-bucketed full-outer df merge: no Exchange above the bucketed scans") {
    for (t <- Seq("fpn_a", "fpn_b"))
      graft.sources.Sinks.dropTable(spark, t)
    val a = Seq(("the", 3L), ("cat", 2L)).toDF("term", "df")
    val b = Seq(("the", 1L), ("dog", 4L)).toDF("term", "df")
    graft.sources.Sinks.parquetBucketed(a, "fpn_a", 8, Seq("term"), Seq("term"))
    graft.sources.Sinks.parquetBucketed(b, "fpn_b", 8, Seq("term"), Seq("term"))
    val merged = spark.table("fpn_a").withColumnRenamed("df", "da")
      .join(spark.table("fpn_b").withColumnRenamed("df", "db"),
        Seq("term"), "full_outer")
      .select(col("term"), (coalesce(col("da"), lit(0L)) +
        coalesce(col("db"), lit(0L))).as("df"))
    merged.collect() // settle AQE so the final plan is inspectable
    val p = plan(merged)
    assert(!p.contains("Exchange"),
      s"the co-bucketed merge join should pair buckets, not shuffle:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected a bucket-paired join in:\n$p")
  }

  test("federated ANN serve keeps each shard's cell-pruned bucketed scan") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val a = e.filter(col("vec_id") % 3 === 0)
    val b = e.filter(col("vec_id") % 3 === 1)
    val queries = e.filter(col("vec_id") % 41 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val shards = Seq((a, "fpn_ivf_a", 7L), (b, "fpn_ivf_b", 11L)).map {
      case (df, t, seed) =>
        val m = graft.ann.IvfIndex(nlist = 8, nprobe = 2, seed = seed).fit(df)
        m.saveStore(df, t, buckets = 4)
        (m, t)
    }
    val fed = graft.ann.AnnFederation
      .knnAcrossIvfStores(spark, shards, queries, 5)
    fed.collect()
    val p = plan(fed)
    // both shards' store scans appear, each bucketed on cell
    assert(p.contains("fpn_ivf_a") && p.contains("fpn_ivf_b"),
      s"both shard stores must be scanned:\n$p")
    assert("Bucketed: true".r.findAllIn(p).size >= 2,
      s"shard scans must stay bucketed (cell-pruned candidates):\n$p")
  }
}
