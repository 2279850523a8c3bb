package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Brute-force exact k-NN — the oracle path (SURVEY §7 M1).
  *
  * Shapes, not loops: a single-query search is a filter + broadcast cross
  * join + `orderBy(dist).limit(k)`, which Catalyst plans as
  * `TakeOrderedAndProject` (a true distributed top-k: per-partition heaps,
  * no global sort). A query *batch* is a broadcast join of the (small)
  * query set against the (huge) corpus plus a per-query window top-k —
  * the corpus side never shuffles, so the plan scales to an arbitrarily
  * large corpus as long as the query batch stays broadcastable.
  *
  * Distance is squared euclidean, matching the reference's contract
  * (reference src/lib.rs:137-146: squared; sqrt only at display,
  * src/main.rs:91).
  */
object KnnExact {

  /** Exact top-k for one query vector identified by id (the reference's
    * X1 "visualization" query shape, src/main.rs:80-93, minus the word
    * dictionary — lookups are joins here).
    */
  def searchById(
      corpus: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = corpus.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    corpus.crossJoin(broadcast(q))
      .select(
        col(idCol),
        sqEucDist(col(vecCol), col("__qvec")).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Exact k-NN for a batch of queries: returns
    * (query_id, neighbor_id, dist, rank), rank 1..k per query.
    * Query batch is broadcast; corpus streams through unshuffled until
    * the per-query top-k window (which shuffles only k·|queries| rows
    * after AQE's partial TakeOrdered — acceptable; the exact path is the
    * oracle, ANN is the scale path).
    */
  def knnBatch(
      corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame = {
    val joined = graft.GraftSession.widen(corpus).crossJoin(broadcast(queries))
      .select(
        col(queryId),
        col(corpusId).as("neighbor_id"),
        sqEucDist(col(corpusVec), col(queryVec)).as("dist"))
    // bounded per-key heaps prune candidates to k per query BEFORE the
    // shuffle (custom TopKPerKey operator — no full per-partition sort)
    graft.plans.TopKPerKey.rankedTopK(joined, queryId, Seq("dist", "neighbor_id"), k)
  }

  /** Bulk k-NN self-join (reference Q4, src/main.rs:100-123): every
    * corpus vector queries the corpus (self included, as the reference
    * does). Exact variant — O(n²), oracle/test scale only; the ANN
    * `AnnForestModel.knnJoin` is the production path.
    */
  def selfJoinExact(
      corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val queries = corpus.select(
      col(idCol).as("query_id"), col(vecCol).as("qvec"))
    knnBatch(corpus, queries, k, idCol, vecCol)
  }

  /** Exact distance-threshold ("radius") join: every (query, corpus)
    * pair within `maxDist` SQUARED euclidean. Same scale shape as
    * [[knnBatch]] — the query batch broadcasts, the corpus streams
    * through unshuffled — but with NO shuffle at all after the scan:
    * the threshold filter is a codegen'd predicate fused into the
    * broadcast join stage, pairs are unique by construction (no dedup),
    * and there is no per-query window/heap. Output is deterministic
    * (set semantics, no rank ties), which is what lets q82 carry a full
    * DuckDB oracle where top-k ANN queries cannot.
    *
    * The approximate counterparts for standing indexes are
    * [[graft.ann.AnnForestModel.radiusJoinBucketed]] and
    * [[graft.ann.IvfModel.radiusJoin]]. */
  def radiusJoin(
      corpus: DataFrame, queries: DataFrame, maxDist: Double,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame =
    graft.GraftSession.widen(corpus).crossJoin(broadcast(queries))
      .select(
        col(queryId),
        col(corpusId).as("neighbor_id"),
        sqEucDist(col(corpusVec), col(queryVec)).as("dist"))
      .filter(col("dist") <= maxDist)

  /** Q3 projection: neighbor id-set per query (reference
    * src/main.rs:125-136), distances dropped. */
  def asIdSets(knn: DataFrame): DataFrame =
    knn.groupBy("query_id")
      .agg(sort_array(collect_set(col("neighbor_id"))).as("neighbor_ids"))
}
