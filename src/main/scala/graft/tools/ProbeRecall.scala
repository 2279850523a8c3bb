package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann._
import graft.operators.{KnnExact, MlLsh}
import graft.sources.Tables

/** Round-5 probe: per-backend ANN recall@10 vs the exact oracle at the
  * driver's correctness SF (sf0.01) — picks the q83 gate floors. */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val d = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, d).cache()
    e.count()
    val queries = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = KnnExact.knnBatch(e, queries, 10)
      .select("query_id", "neighbor_id").cache()
    val denom = exact.count().toDouble

    def recall(name: String, got: DataFrame): Unit = {
      val hits = got.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id")).count()
      println(f"[recall] $name%-16s ${hits / denom}%.4f ($hits/${denom.toLong})")
    }

    val forest = AnnForest(numTrees = 50, maxLeafSize = 5, seed = 42L)
      .fit(e, "vec_id", "embedding")
    recall("traversal", forest.searchBatch(queries, 10))
    recall("self_bucketed", forest.knnSelfJoinBucketed(e, topK = 10)
      .filter(col("query_id") < 50))
    val dist = DistributedAnnForest(numTrees = 50, maxLeafSize = 5, maxDepth = 16, seed = 42L)
      .fit(e, "vec_id", "embedding")
    recall("distributed", dist.knnJoin(queries, topK = 10))
    recall("ivf", IvfIndex(nlist = 16, nprobe = 4, seed = 42L).fit(e)
      .knnJoin(e, queries, topK = 10))
    recall("mllib_lsh", MlLsh.approxKnnJoin(e, queries, k = 10, maxDist = 1e9))
    val pq = PqIndex(m = 16, seed = 42L).fit(e)
    recall("pq_adc", pq.knnJoin(pq.encode(e).select("vec_id", "pq_code"), queries, topK = 10))
    spark.stop()
  }
}
