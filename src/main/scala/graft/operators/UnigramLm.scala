package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the CCNet-style
  * "perplexity filter" primitive: score every document by the mean log
  * probability of its tokens under a unigram LM fit on the corpus
  * itself (or on a held-out reference corpus via [[scoreAgainst]]).
  * Low-probability word soup scores far below fluent text, so a
  * threshold on the score is the classic LM-quality gate applied after
  * the rule-based filters (TextAnalysis.gopherKeep) and before dedup.
  *
  * Scale shape: one explode (narrow), one token-count aggregation
  * (map-side partial combine — compact (token, count) rows cross the
  * shuffle), one equi-join of token instances against the vocabulary,
  * one per-doc aggregation. The vocabulary is Zipf-bounded (≪ corpus
  * size), so at 100 TB the join side is typically broadcastable; we
  * leave the hint to Catalyst/AQE since vocab size is data-dependent.
  * Nothing here collects to the driver.
  */
object UnigramLm {

  /** (doc_id, n_tokens, logprob_avg): mean ln p(token) per document,
    * p(t) = count(t) / total tokens, both estimated on `reference`.
    * Tokens absent from the reference corpus are dropped from the mean
    * (inner join) — with add-one smoothing they would dominate the
    * score with an arbitrary constant instead.
    *
    * Rounded to 4 decimals: float sums are combine-order-dependent
    * (same convention as every DOUBLE aggregate in SparkEntry). */
  def scoreAgainst(docs: DataFrame, reference: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val refToks = tokenInstances(reference, idCol, textCol)
    val counts = refToks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    // total as a 1-row aggregate crossed in (not a driver action): the
    // whole score stays one declarative plan.
    val total = counts.agg(sum(col("cnt")).as("total"))
    tokenInstances(docs, idCol, textCol)
      .join(counts, "token")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("cnt") / col("total"))), 4).as("logprob_avg"))
  }

  /** Self-trained variant: the LM corpus is the scored corpus. */
  def score(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreAgainst(docs, docs, idCol, textCol)

  private def tokenInstances(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
}
