package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib interop: the library's second ANN backend.
  *
  * `BucketedRandomProjectionLSH` is the same random-projection family as
  * the reference's hyperplane forest (random *directions* + bucket
  * width vs. random *bisectors* + tree recursion — SURVEY §2.1 B1). It
  * trades the forest's recursive build for a stateless projection, which
  * makes it the simplest fully-distributed alternative: no driver-side
  * build at all, index = a handful of random vectors.
  *
  * Note MLlib vectors are f64 — a documented precision divergence from
  * the engine's f32 path (SURVEY §1.4).
  */
object MlLsh {

  /** Approximate distance join: pairs within `maxDist` (euclidean). */
  def approxDistanceJoin(
      dfA: DataFrame, dfB: DataFrame, maxDist: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bucketLength: Double = 2.0, numHashTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val toVec = (df: DataFrame) => df.select(
      col(idCol).as("id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val a = toVec(dfA); val b = toVec(dfB)
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setInputCol("features").setOutputCol("hashes").setSeed(seed)
    val model = lsh.fit(a)
    model.approxSimilarityJoin(a, b, maxDist, "dist")
      .select(
        col("datasetA.id").as("id_a"),
        col("datasetB.id").as("id_b"),
        col("dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** Approximate k-NN join via LSH buckets + per-query top-k window. */
  def approxKnnJoin(
      corpus: DataFrame, queries: DataFrame, k: Int, maxDist: Double,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec",
      bucketLength: Double = 2.0, numHashTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val c = corpus.select(
      col(corpusId).as("id"),
      array_to_vector(col(corpusVec).cast("array<double>")).as("features"))
    val q = queries.select(
      col(queryId).as("id"),
      array_to_vector(col(queryVec).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setInputCol("features").setOutputCol("hashes").setSeed(seed)
    val model = lsh.fit(c)
    val joined = model.approxSimilarityJoin(q, c, maxDist, "dist")
      .select(
        col("datasetA.id").as("query_id"),
        col("datasetB.id").as("neighbor_id"),
        col("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
