package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One-off probe: distributed-forest radius recall vs exact at the q82
  * fixture settings, and the zone-map pruning ratio (probes dropped /
  * probes routed). Run: sbt "runMain graft.tools.ProbeZoneMap". */
object ProbeZoneMap {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = Tables.embeddings(spark, d)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = graft.operators.KnnExact.radiusJoin(e, q, maxDist = 1.2535)
      .select(col("query_id"), col("neighbor_id"))
    val model = graft.ann.DistributedAnnForest(
      numTrees = 50, maxLeafSize = 5, maxDepth = 16, seed = 42L).fit(e)
    for (eps <- Seq(0.0, 0.1, 0.25)) {
      val ann = model.radiusJoin(q, maxDist = 1.2535, querySpillEps = eps,
          useZoneMaps = true)
        .select(col("query_id"), col("neighbor_id"))
      val nExact = exact.count(); val nAnn = ann.count()
      val inter = ann.intersect(exact).count()
      println(s"ZONEPROBE eps=$eps exact=$nExact ann=$nAnn inter=$inter")
    }
    // pruning ratio at eps=0.25 across radii (smaller radius = the
    // near-dup serving regime = more pruning)
    import graft.functions.VectorFunctions.{l2Normalize, sqEucDist}
    val routed = model.assignLeaves(q, spillEps = 0.25, maxLeavesPerTree = 4)
    val routedQ =
      if (model.metric == "cosine") routed.withColumn("__qv", l2Normalize(col("__qv")))
      else routed
    val joined = routedQ.join(model.zoneMaps, Seq("tree_id", "leaf_id"))
      .localCheckpoint()
    val total = joined.count()
    for (md <- Seq(1.2535, 0.6, 0.3, 0.1)) {
      val kept = joined.filter(
        sqrt(sqEucDist(col("__qv"), col("__centroid"))) - col("__cov") <=
          lit(math.sqrt(md) + 1e-5)).count()
      println(s"ZONEPROBE maxDist=$md probes total=$total kept=$kept " +
        f"pruned_ratio=${(total - kept).toDouble / total}%.3f")
    }
    spark.stop()
  }
}
