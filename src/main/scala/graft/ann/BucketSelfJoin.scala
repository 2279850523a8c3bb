package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared tail of the bulk k-NN *self*-join (reference Q4,
  * src/main.rs:100-123) over an already-routed corpus — used by both
  * forest backends ([[AnnForestModel.knnSelfJoinBucketed]] routes first;
  * [[DistributedAnnModel.knnSelfJoin]] reuses its standing bucket table
  * with zero routing work).
  *
  * Members of each (tree_id, leaf_id) bucket are gathered with
  * collect_list and all ordered pairs are generated in place with two
  * Generates: no self-join, so the routed rows cross exactly one
  * vector-bearing shuffle (the bucket groupBy) instead of two join-side
  * exchanges. The dedup+top-k tail is the same single-shuffle shape as
  * [[AnnForestModel.knnJoinBucketed]]: hash-partitioning the compact
  * (query_id, neighbor_id, dist) candidates by query_id alone satisfies
  * ClusteredDistribution for both the min-dedup aggregate and
  * TopKPerKey, so EnsureRequirements inserts no further exchange.
  *
  * Skew note: a bucket with m members emits m² candidate rows — the
  * same blowup the join formulation has — and m is bounded by the fit
  * leaf cap plus exact-duplicate multiplicity.
  */
private[ann] object BucketSelfJoin {

  /** `routed` schema: (tree_id, leaf_id, neighbor_id, <vecCol>); under
    * metric="cosine" the vectors must already be normalized (both
    * callers' routed tables are). */
  def pairsTopK(routed: DataFrame, vecCol: String, topK: Int): DataFrame = {
    import graft.functions.VectorFunctions.sqEucDist
    val buckets = routed
      .groupBy(col("tree_id"), col("leaf_id"))
      .agg(collect_list(struct(col("neighbor_id"), col(vecCol))).as("__members"))
    val candidates = buckets
      .select(explode(col("__members")).as("__q"), col("__members"))
      .select(
        col("__q.neighbor_id").as("query_id"),
        col(s"__q.$vecCol").as("__qv"),
        explode(col("__members")).as("__n"))
      .select(
        col("query_id"),
        col(s"__n.neighbor_id").as("neighbor_id"),
        sqEucDist(col(s"__n.$vecCol"), col("__qv")).as("dist"))
      .repartition(col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(min(col("dist")).as("dist")) // union across trees
    graft.plans.TopKPerKey.rankedTopK(
      candidates, "query_id", Seq("dist", "neighbor_id"), topK)
  }
}
