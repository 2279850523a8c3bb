package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Binary (1-bit) embedding quantization with exact rerank — the 32×
  * compression complement to SQ8 (4×, `VectorFunctions.sq8*`) and PQ
  * (~32× with codebooks, [[graft.ann.PqIndex]]).
  *
  * Each f32 dimension becomes its sign bit ([[graft.functions.SignPack]]);
  * Hamming distance over the packed words approximates angular distance
  * for roughly-centered embeddings, and a popcount scan over 1-bit codes
  * is the cheapest possible first pass — at 100 TB of f32 vectors the
  * code table is ~3 TB, and the scan stage moves one long per 64 dims
  * through an XOR+POPCNT loop fused into whole-stage codegen
  * ([[graft.functions.HammingPacked]]).
  *
  * Serving is the standard two-stage shape:
  *   1. Hamming scan: quantized query batch broadcasts against the code
  *      table; the corpus side never shuffles; bounded per-query heaps
  *      ([[graft.plans.TopKPerKey]]) cut candidates to c before any
  *      exchange — the same plan discipline as `KnnExact.knnBatch`.
  *   2. Exact rerank: the (|queries|·c)-row candidate set — the SMALL
  *      side now — broadcasts back against the full-precision corpus, so
  *      the wide vectors are never shuffled either; exact cosine orders
  *      the final top-k.
  * Recall is governed by c (the oversample): rank-k-by-Hamming must fall
  * within the top-c for the true neighbor to be rerank-visible. The
  * rerank stage itself is exact, so results degrade to "missing", never
  * to "wrong order" (BinaryQuantSpec pins both properties; q190 carries
  * the full DuckDB oracle — sign bits, Hamming, candidate cut, and
  * rerank are all deterministic, so unlike the ANN family this
  * approximate path hash-matches end to end).
  */
object BinaryQuant {

  /** Encode: (idCol, codeCol ARRAY<BIGINT>). Write-once projection —
    * at scale this lands next to the corpus as a code table (narrow,
    * scan-friendly), like the SQ8/PQ code tables. */
  def quantize(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", codeCol: String = "bq"): DataFrame =
    df.select(col(idCol), signPack(col(vecCol)).as(codeCol))

  /** Two-stage top-k: Hamming top-c candidates (ties broken by id),
    * exact-cosine rerank to k (ties broken by id). Returns
    * (queryId, rank 1..k, neighbor_id, ham, cos rounded 4dp).
    *
    * `corpus` needs (corpusId, corpusVec); `queries` (queryId, queryVec).
    * The query batch must be broadcastable — the corpus may be
    * arbitrarily large (both passes stream it unshuffled).
    */
  def topKRerank(corpus: DataFrame, queries: DataFrame, k: Int, c: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame = {
    require(c >= k, s"oversample c=$c must be >= k=$k")
    val codes = quantize(corpus, corpusId, corpusVec, "__code")
    val qcodes = queries.select(
      col(queryId), signPack(col(queryVec)).as("__qcode"))
    // pass 1: popcount scan, corpus unshuffled, per-query bounded heaps
    val ham = graft.GraftSession.widen(codes).crossJoin(broadcast(qcodes))
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        hammingPacked(col("__code"), col("__qcode")).as("ham"))
    val cand = graft.plans.TopKPerKey.perKey(
      ham, Seq(queryId), Seq("ham", "neighbor_id"), c)
    rerank(corpus, queries, cand, k, corpusId, corpusVec, queryId, queryVec,
      carry = Seq("ham"))
  }

  /** [[topKRerank]] with the ASYMMETRIC first pass: the full-precision
    * query dotted against the sign-reconstructed ±1 document
    * ([[graft.functions.AsymmetricBqDot]]) instead of code-vs-code
    * Hamming. Same 32× document storage, same plan shape, better
    * candidate recall at the same oversample (+8pp@c=50 measured on
    * the fixture) — the query side is tiny, so there is no reason to
    * quantize it. Returns (queryId, rank, neighbor_id, cos). */
  def topKRerankAsym(corpus: DataFrame, queries: DataFrame, k: Int, c: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec"): DataFrame = {
    require(c >= k, s"oversample c=$c must be >= k=$k")
    val codes = quantize(corpus, corpusId, corpusVec, "__code")
    val scoredPass = graft.GraftSession.widen(codes)
      .crossJoin(broadcast(queries))
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        (-bqAsymDot(col(queryVec), col("__code"))).as("__negasym"))
    val cand = graft.plans.TopKPerKey.perKey(
      scoredPass, Seq(queryId), Seq("__negasym", "neighbor_id"), c)
    rerank(corpus, queries, cand, k, corpusId, corpusVec, queryId, queryVec,
      carry = Seq.empty)
  }

  /** Pass 2 shared by both first passes AND by
    * [[Matryoshka.prefixRerank]] (one rerank discipline, one code
    * path): candidates (|q|·c rows) — the SMALL side now — broadcast
    * against the full-precision corpus, so the wide vectors never
    * shuffle; exact cosine orders the top-k. `carry` = pass-1 columns
    * to keep in the output. */
  private[operators] def rerank(corpus: DataFrame, queries: DataFrame, cand: DataFrame,
      k: Int, corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, carry: Seq[String]): DataFrame = {
    val withVec = corpus.join(broadcast(cand),
        corpus(corpusId) === cand("neighbor_id"))
      .select((Seq(cand(queryId), cand("neighbor_id")) ++
        carry.map(cand(_)) :+ corpus(corpusVec).as("__vec")): _*)
    val scored = withVec.join(broadcast(queries), queryId)
      .select((Seq(col(queryId), col("neighbor_id")) ++
        carry.map(col) :+ cosine(col("__vec"), col(queryVec)).as("__cos")): _*)
      .withColumn("__negcos", -col("__cos"))
    graft.plans.TopKPerKey.rankedTopK(
        scored, queryId, Seq("__negcos", "neighbor_id"), k)
      .select((Seq(col(queryId), col("rank"), col("neighbor_id")) ++
        carry.map(col) :+ round(col("__cos"), 4).as("cos")): _*)
  }
}
