package graft.tools
import org.apache.spark.sql.functions._
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val vecs = spark.range(200000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 1000.0).cast("float")).as("embedding"))
      .repartition(64).cache()
    vecs.count()
    val dm = graft.ann.DistributedAnnForest(numTrees = 20, maxLeafSize = 5, maxDepth = 14, seed = 42L)
      .fit(vecs, "vec_id", "embedding")
    val sizes = dm.corpusBuckets.groupBy("tree_id", "leaf_id").count()
    sizes.select(
      count(lit(1)).as("n_buckets"),
      min("count"), expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"), max("count"),
      sum(col("count") * col("count")).as("sum_m2")).show(false)
    sizes.orderBy(col("count").desc).show(10, false)
    spark.stop()
  }
}
