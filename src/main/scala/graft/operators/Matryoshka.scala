package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Matryoshka (prefix-dimension) serving — the DIMENSION-axis
  * compression complement to [[BinaryQuant]]'s bit axis: MRL-trained
  * embeddings (Kusupati et al. 2022, the layout shipped by current
  * hosted embedding APIs) order information by coordinate, so the
  * first d dimensions of a D-dim vector are themselves a usable
  * embedding. A first pass over the d-dim PREFIX scans d/D of the
  * bytes; exact full-dim cosine reranks the survivors.
  *
  * Cosine is scale-invariant, so prefix truncation needs no
  * re-normalization for ranking purposes — the slice feeds the same
  * one-pass cosine kernel.
  *
  * Plan shapes mirror [[BinaryQuant.topKRerank]] (broadcast the query
  * batch out, stream the corpus unshuffled, bounded per-key heaps, then
  * broadcast the (|q|·c)-row candidate set back against the
  * full-precision corpus), and [[overlapReport]]'s multi-dim audit runs
  * ALL dims in ONE corpus pass — dims ride the broadcast side as an
  * exploded literal array, so adding a dim never adds a scan.
  */
object Matryoshka {

  /** Two-stage top-k: prefix-cosine (first `dPrefix` dims) top-c
    * candidates, full-dim exact-cosine rerank to k. Returns
    * (queryId, rank 1..k, neighbor_id, cos rounded 4dp). Same
    * degrades-to-missing-only contract as BinaryQuant: the rerank is
    * exact, so oversample c only governs recall, never order. */
  def prefixRerank(corpus: DataFrame, queries: DataFrame, k: Int, c: Int,
      dPrefix: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame = {
    require(c >= k, s"oversample c=$c must be >= k=$k")
    require(dPrefix > 0)
    val pre = graft.GraftSession.widen(corpus)
      .crossJoin(broadcast(queries))
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        (-cosine(slice(col(corpusVec), 1, dPrefix),
          slice(col(queryVec), 1, dPrefix))).as("__negpre"))
    val cand = graft.plans.TopKPerKey.perKey(
      pre, Seq(queryId), Seq("__negpre", "neighbor_id"), c)
    // one rerank discipline, one code path — shared with BinaryQuant
    BinaryQuant.rerank(corpus, queries, cand, k,
      corpusId, corpusVec, queryId, queryVec, carry = Seq.empty)
  }

  /** The dim-selection audit: for every prefix dim d in `dims`,
    * overlap@k between the d-dim top-k and the FULL-dim top-k, per
    * query — the number that picks the serving dim for a corpus (the
    * fertility report's role, on the embedding side). One corpus pass
    * for all dims: the (query × dim) probe set is built on the
    * broadcast side (explode of a literal array), the corpus streams
    * once, per-(dim, query) bounded heaps cut to k. Output
    * (dim, query_id, overlap), overlap ∈ [0, k] exact integers. */
  def overlapReport(corpus: DataFrame, queries: DataFrame, k: Int,
      dims: Seq[Int], fullDim: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d > 0 && d < fullDim))
    val probes = queries.select(col(queryId), col(queryVec),
        explode(lit((dims :+ fullDim).toArray)).as("dim"))
    val scored = graft.GraftSession.widen(corpus)
      .crossJoin(broadcast(probes))
      .select(col("dim"), col(queryId), col(corpusId).as("neighbor_id"),
        (-cosine(slice(col(corpusVec), lit(1), col("dim")),
          slice(col(queryVec), lit(1), col("dim")))).as("__neg"))
    // settle the k·|q|·|dims|-row top-k ONCE: it feeds both the full-dim
    // and prefix-dim legs, and an unsettled frame would re-execute the
    // corpus scan per leg (the q186/q191 localCheckpoint discipline)
    val topk = graft.plans.TopKPerKey.perKey(
        scored, Seq("dim", queryId), Seq("__neg", "neighbor_id"), k)
      .localCheckpoint()
    val full = topk.filter(col("dim") === fullDim)
      .select(col(queryId).as("__qid"), col("neighbor_id").as("__nid"),
        lit(1L).as("__hit"))
    // left join + conditional count, NOT a semi-join + count: a dim
    // whose top-k shares nothing with full-dim must still report 0
    topk.filter(col("dim") =!= fullDim)
      .join(broadcast(full), col(queryId) === col("__qid") &&
        col("neighbor_id") === col("__nid"), "left_outer")
      .groupBy(col("dim"), col(queryId))
      .agg(coalesce(sum(col("__hit")), lit(0L)).as("overlap"))
  }
}
