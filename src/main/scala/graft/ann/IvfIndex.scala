package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: a k-means coarse quantizer partitions
  * the vector space into `nlist` cells; queries probe the `nprobe`
  * nearest cells and re-rank exactly inside them.
  *
  * The complementary scale path to [[AnnForestModel.knnJoinBucketed]]:
  * where the forest routes by recursive hyperplanes, IVF routes by
  * centroid proximity — one broadcast of `nlist` centroids (tiny), one
  * shuffle of each side on a compact INT cell id, one top-k window.
  * Train on a sample: k-means cost is O(sample · nlist), independent of
  * corpus size; assignment is a narrow map. For a standing corpus,
  * persist the assignment as a bucketed table (same amortization as the
  * forest path).
  */
case class IvfIndex(nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L) {

  def fit(df: DataFrame, vecCol: String = "embedding",
      trainFraction: Double = 1.0): IvfModel = {
    val sample = if (trainFraction < 1.0) df.sample(trainFraction, seed) else df
    val train = sample.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // few iterations suffice: cells only need to be a reasonable space
    // partition, not converged clusters — recall is governed by nprobe
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(train)
    new IvfModel(
      km.clusterCenters.map(_.toArray.map(_.toFloat)), nprobe)
  }
}

object IvfModel {
  private[ann] def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    acc
  }

  private[ann] def nearestCells(
      centroids: Array[Array[Float]], v: Array[Float], n: Int): Array[Int] =
    centroids.indices.sortBy(i => sqDist(centroids(i), v)).take(n).toArray
}

class IvfModel(val centroids: Array[Array[Float]], val nprobe: Int)
    extends Serializable {

  /** One row per probed cell: (input cols…, cell INT). n=1 for corpus
    * assignment, n=nprobe for queries. The closure captures only the
    * centroid array — no per-row allocation beyond the probe result. */
  def assignCells(df: DataFrame, vecCol: String, n: Int): DataFrame = {
    val cs = centroids // stable reference for the closure (serialized once per task)
    val probes = udf { (v: Seq[Float]) =>
      IvfModel.nearestCells(cs, v.toArray, n)
    }
    df.withColumn("cell", explode(probes(col(vecCol))))
  }

  /** Approximate k-NN join: corpus in its home cell, queries probe
    * `nprobe` cells, exact re-rank within probed cells. */
  def knnJoin(
      corpus: DataFrame, queries: DataFrame, topK: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame = {
    import graft.functions.VectorFunctions.sqEucDist
    val c = assignCells(
      corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv")), "__cv", 1)
    val q = assignCells(
      queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv")), "__qv", nprobe)
    val candidates = q.join(c, Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        sqEucDist(col("__cv"), col("__qv")).as("dist"))
      .dropDuplicates("query_id", "neighbor_id")
    graft.plans.TopKPerKey.rankedTopK(
      candidates, "query_id", Seq("dist", "neighbor_id"), topK)
  }
}
