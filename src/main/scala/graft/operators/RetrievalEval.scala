package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — the evaluation side of the search stack
  * (recall\@k, MRR\@k, nDCG\@k per query). A pipeline that serves ANN /
  * BM25 / hybrid rankings needs a harness to score them against
  * relevance judgments; this is that harness, as one declarative plan.
  *
  * Inputs: `results` (qid, doc_id, rank — 1-based, unique per (qid,
  * rank)), `truth` qrels (qid, doc_id, grade > 0; binary relevance is
  * grade = 1). Metrics:
  *   - recall\@k  = |top-k ∩ relevant| / |relevant|
  *   - MRR\@k     = 1 / rank of the first relevant hit (0 if none) —
  *                 computed as max over hits of 1/rank, same thing
  *   - nDCG\@k    = Σ grade/log2(rank+1) over the top-k, normalized by
  *                 the ideal DCG of the top-|k| graded judgments
  *
  * Scale shape: one equi-join of the k-bounded result slice against
  * the qrels + per-query aggregation — no corpus scan at all. The one
  * window runs over the QRELS (ideal-DCG ordering), whose per-query
  * cardinality is judgment-bounded (tens, by construction of any
  * qrel set), never corpus-bounded. Doubles are rounded to 4dp AFTER
  * aggregation on both engine and oracle sides (the repo's standard
  * float discipline). */
object RetrievalEval {

  def metrics(results: DataFrame, truth: DataFrame, k: Int,
      qid: String = "qid", docId: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // qrels are eval-sized (|queries| × tens of judgments) — broadcast
    // explicitly: TopKPerKey upstream hides size estimates, so Catalyst
    // would otherwise sort-merge two frames that are both tiny
    val hits = results.filter(col("rank") <= k)
      .join(broadcast(truth.select(col(qid), col(docId), col("grade"))),
        Seq(qid, docId), "left")
      .select(col(qid), col("rank"),
        coalesce(col("grade"), lit(0.0)).cast("double").as("grade"))
    val perQuery = hits.groupBy(col(qid)).agg(
      sum(when(col("grade") > 0, 1L).otherwise(0L)).as("__hits"),
      max(when(col("grade") > 0, lit(1.0) / col("rank")).otherwise(lit(0.0))).as("__rr"),
      sum(col("grade") / log(2.0, col("rank") + 1)).as("__dcg"))
    // ideal DCG: the qrels' own grades, best-first — the window runs
    // over judgment-bounded groups (a qrel set has tens of rows per
    // query), not the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qid)).orderBy(col("grade").desc, col(docId))
    val ideal = truth
      .withColumn("__irank", row_number().over(w))
      .filter(col("__irank") <= k)
      .groupBy(col(qid)).agg(
        sum(col("grade") / log(2.0, col("__irank") + 1)).as("__idcg"))
    val nRel = truth.filter(col("grade") > 0)
      .groupBy(col(qid)).agg(count(lit(1)).as("__nrel"))
    perQuery
      .join(broadcast(ideal), Seq(qid))
      .join(broadcast(nRel), Seq(qid))
      .select(col(qid),
        round(col("__hits").cast("double") / col("__nrel"), 4).as("recall"),
        round(col("__rr"), 4).as("mrr"),
        round(when(col("__idcg") > 0, col("__dcg") / col("__idcg"))
          .otherwise(lit(0.0)), 4).as("ndcg"))
  }
}
