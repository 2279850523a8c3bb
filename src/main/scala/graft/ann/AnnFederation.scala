package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FEDERATED vector-search serve (round 14): top-k across N standing
  * IVF shards — each shard holds its own corpus slice AND its own
  * independently-fit quantizer ("two crawls embedded and indexed on
  * two clusters"). Queries fan out to every shard's index serve; the
  * per-shard top-k lists merge by (dist, id) into the global top-k.
  *
  * Exactness composes shard-wise: top-k(∪ shards' true top-k) is the
  * true top-k of the union corpus, so in each shard's exact regime
  * (nprobe = nlist) the federated serve is EXACT over the union (the
  * q263 gate rides this under a full DuckDB distance replay). At
  * production nprobe the per-shard recall floors CARRY OVER: a true
  * neighbor can only be missed by its HOME shard's index — the other
  * shards never mask it, because the merge keeps every candidate that
  * wins on distance (AnnFederationSpec's recall case).
  *
  * WHY serve-side federation and not an index merge: unlike counts
  * (NB / LM / BM25 / HH — this round's exact store⊕store merges), an
  * IVF quantizer is NOT a mergeable summary. Two k-means fits carry
  * different centroid sets; re-assigning either side's vectors into
  * the other's cells is a corpus-sized re-index, not a model-sized
  * merge, and a centroid-union "merged quantizer" changes every cell
  * boundary (so neither side's stored assignments stay valid). The
  * scale-correct federation for ANN is therefore scatter-gather at
  * SERVE time: candidate generation stays index-pruned and
  * shard-local; only the |queries|·topK result rows move to the
  * coordinator's merge — which is how production vector stores shard.
  * Same divergence-ledger honesty as the champions drop in
  * [[graft.operators.Bm25.mergeIndexes]]: merge what composes
  * exactly, serve across what does not.
  *
  * Contract: shard stores hold DISJOINT corpus slices (every vector
  * lives on exactly its home shard) — a vector stored on two shards
  * would occupy two result slots under two identical distances. The
  * per-(query, neighbor) dedup inside each shard's serve does not
  * reach across shards.
  */
object AnnFederation {

  /** Serve global top-k over `shards` = (fitted model, store table)
    * pairs. Output (query_id, rank 1..k, neighbor_id, dist) — the
    * knnJoinStore contract, rank recomputed over the merged lists.
    * Per-shard pending tombstones subtract before scoring, exactly as
    * each shard's own serve would. */
  def knnAcrossIvfStores(spark: SparkSession,
      shards: Seq[(IvfModel, String)], queries: DataFrame, topK: Int,
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame = {
    require(shards.nonEmpty, "knnAcrossIvfStores: no shards given")
    val perShard = shards.map { case (model, table) =>
      model.knnJoinStore(spark, table, queries, topK, queryId, queryVec)
        .select(col("query_id"), col("neighbor_id"), col("dist"))
    }
    graft.plans.TopKPerKey.rankedTopK(
      perShard.reduce(_.unionByName(_)),
      "query_id", Seq("dist", "neighbor_id"), topK)
  }
}
