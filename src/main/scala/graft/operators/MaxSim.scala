package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine
import graft.plans.TopKPerKey

/** Late-interaction (MaxSim) multi-vector retrieval — the ColBERT
  * scoring model (Khattab & Zaharia, SIGIR 2020): a document is a BAG
  * of token vectors, a query likewise, and
  *
  *   score(q, d) = Σ_{t ∈ q} max_{u ∈ d} cos(t, u)
  *
  * This is the retrieval family the reference's single-vector search
  * (reference src/lib.rs:130 takes one query vector) cannot express:
  * fine-grained token-level matching with an aggregate per document.
  *
  * Scale shape. Queries are tiny (a handful of token vectors each) and
  * broadcast; the corpus token table streams once through the cosine
  * kernel — a narrow pass, no corpus-side shuffle of vectors. After
  * scoring, only compact (qid, qt, gid, cos) rows move: one shuffle for
  * the per-(query-token, doc) max, one for the per-doc sum. Both aggs
  * combine map-side. The serving path ([[topKRefined]]) additionally
  * prunes the per-token candidate stream through the bounded-heap
  * [[TopKPerKey]] operator, so no stage ever sorts or retains the full
  * corpus — the same two-stage candidate-then-refine design ColBERT
  * deploys with an ANN first stage (swap stage 1 for
  * `DistributedAnnForest.search` over the token store at 100 TB; the
  * refine stage is unchanged).
  *
  * Required schemas (documented contract, kept positional-free):
  *  - corpus:  (gid: long, vec: array<float>)  — one row per doc token
  *  - queries: (qid: long, qt: long, qvec: array<float>) — one row per
  *    query token; qt is any id unique within its query.
  */
object MaxSim {

  /** Exact MaxSim score of every (query, doc-group) pair:
    * (qid, gid, maxsim). The sum is rounded to 4 decimals (float sums
    * are combine-order-dependent — SparkEntry convention). */
  def scores(corpus: DataFrame, queries: DataFrame): DataFrame = {
    val cos = corpus
      .crossJoin(broadcast(queries))
      .select(col("qid"), col("qt"), col("gid"),
        cosine(col("vec"), col("qvec")).as("cos"))
    cos
      .groupBy(col("qid"), col("qt"), col("gid"))
      .agg(max(col("cos")).as("m"))
      .groupBy(col("qid"), col("gid"))
      .agg(round(sum(col("m")), 4).as("maxsim"))
  }

  /** Top-k doc groups per query by exact MaxSim:
    * (qid, gid, rank, maxsim), rank 1..k, ties broken by gid. The rank
    * window only ever sees ≤ k rows per query — the heap prune runs
    * first. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    rankTail(scores(corpus, queries), k)

  /** Production serving shape: stage 1 generates candidate doc groups
    * per query TOKEN (top `candPerTok` corpus tokens by cosine, heap-
    * pruned — never a corpus-wide sort); stage 2 computes exact MaxSim
    * on the candidate groups only. With a generous `candPerTok` the
    * refined top-k equals the exact top-k (pinned by the q96 oracle at
    * verify scale, the q63/q64 shortlist-recovers-exact pattern); at
    * 100 TB stage 1 becomes an ANN probe over the standing token store
    * and stage 2's cost is bounded by |candidates|·|query tokens|.
    *
    * A doc group can only reach the exact top-k through tokens that
    * score high against SOME query token, so widening candPerTok
    * converges on the exact answer — same knob discipline as IVF
    * nprobe. */
  def topKRefined(corpus: DataFrame, queries: DataFrame, k: Int,
      candPerTok: Int): DataFrame = {
    val cos = corpus
      .crossJoin(broadcast(queries))
      .select(col("qid"), col("qt"), col("gid"),
        cosine(col("vec"), col("qvec")).as("cos"))
    // Stage 1: bounded heap per (query, query-token) over (-cos, gid);
    // distinct candidate groups per query.
    val cands = TopKPerKey
      .perKey(cos.withColumn("negcos", -col("cos")),
        Seq("qid", "qt"), Seq("negcos", "gid"), candPerTok)
      .select(col("qid"), col("gid")).distinct()
    topKOnCandidates(corpus, queries, k, cands)
  }

  /** Stage 2 alone: exact MaxSim restricted to a caller-provided
    * candidate set (qid, gid) — the refine tail every stage-1 shares.
    * The corpus prunes to candidate groups BEFORE the cosine pass, so
    * the scoring cost follows |candidate groups| · |query tokens|, not
    * corpus size — this is what an ANN stage-1 over the standing token
    * store buys at scale (see the q104 wiring). */
  def topKOnCandidates(corpus: DataFrame, queries: DataFrame, k: Int,
      cands: DataFrame): DataFrame = {
    val corpusCand = corpus
      .join(cands.select(col("gid")).distinct(), Seq("gid"), "left_semi")
    val scored = corpusCand
      .crossJoin(broadcast(queries))
      .join(cands, Seq("qid", "gid"), "left_semi")
      .select(col("qid"), col("qt"), col("gid"),
        cosine(col("vec"), col("qvec")).as("cos"))
      .groupBy(col("qid"), col("qt"), col("gid"))
      .agg(max(col("cos")).as("m"))
      .groupBy(col("qid"), col("gid"))
      .agg(round(sum(col("m")), 4).as("maxsim"))
    rankTail(scored, k)
  }

  /** Shared top-k tail: heap-prune to k per query, then rank over ≤ k
    * rows per key. */
  private def rankTail(scored: DataFrame, k: Int): DataFrame = {
    val pruned = TopKPerKey.perKey(
      scored.withColumn("negscore", -col("maxsim")),
      Seq("qid"), Seq("negscore", "gid"), k)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("negscore"), col("gid"))
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("gid"), col("rank"), col("maxsim"))
  }
}
