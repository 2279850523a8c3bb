package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Probe: can batched vector-ingest admission (standing forest store,
  * frozen batch-1 planes, spill + zone maps) exactly reproduce the
  * brute-force seen-store admission set on the fixture? */
object ProbeVecIngest {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val minCos = 0.4
    val maxDist = 2.0 * (1.0 - minCos)
    // truth: admitted = not the later side of any exact cosine pair
    val exactPairs = graft.operators.TextDedup.cosineNearDupPairs(
      Tables.embeddings(spark, d), "vec_id", "embedding", minCos)
    val rejected = exactPairs.select(col("id_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    val all = e.select("vec_id").collect().map(_.getLong(0)).toSet
    val truth = all.diff(rejected)

    for (eps <- Seq(0.25, 0.4)) {
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val n = 4
      val step = (maxId + n) / n
      var model: Option[graft.ann.DistributedAnnModel] = None
      val admitted = scala.collection.mutable.Set.empty[Long]
      for (k <- 0 until n) {
        val batch = e.filter(col("vec_id") >= k * step && col("vec_id") < (k + 1) * step)
          .localCheckpoint()
        val inBatch = graft.operators.TextDedup.cosineNearDupPairs(
            batch, "vec_id", "embedding", minCos)
          .select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
        val cross = model match {
          case None => Set.empty[Long]
          case Some(m) =>
            m.radiusJoin(
                batch.select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
                maxDist, querySpillEps = eps, queryMaxLeaves = 8, useZoneMaps = true)
              .select(col("query_id")).distinct().collect().map(_.getLong(0)).toSet
        }
        admitted ++= batch.select("vec_id").collect().map(_.getLong(0)).toSet
          .diff(inBatch).diff(cross)
        model = Some(model match {
          case None => graft.ann.DistributedAnnForest(
            numTrees = 50, maxLeafSize = 5, maxDepth = 16, seed = 42L,
            metric = "cosine").fit(batch)
          case Some(m) => m.append(batch)
        })
      }
      val missedRejects = admitted.toSet.diff(truth) // should have been rejected
      val overRejects = truth.diff(admitted.toSet)   // wrongly rejected
      println(s"VECINGEST eps=$eps admitted=${admitted.size} truth=${truth.size} " +
        s"falseAdmit=${missedRejects.size} falseReject=${overRejects.size}")
    }
    spark.stop()
  }
}
