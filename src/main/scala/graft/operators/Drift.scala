package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift / slice-divergence metrics — the monitoring side of a
  * training-data pipeline: "did this source's token distribution move
  * away from the corpus mix?" is the question behind mixture reweighting
  * and contamination triage.
  *
  * KL here is the plug-in estimate restricted to the slice's support
  * (P(t) > 0 implies Q(t) > 0 because every slice token is a corpus
  * token — no smoothing constant to tune, and the result is exactly
  * SQL-expressible for the oracle):
  *
  *   KL(P_s || Q) = sum_t (c_st / n_s) * ln( (c_st / n_s) / (c_t / N) )
  *
  * Scale shape: two hash aggregations over the exploded token stream
  * (per-(slice, token), then per-token marginals joined back on token)
  * — partial map-side combine everywhere, shuffles keyed on tokens, no
  * window, no driver state. The token marginal join is shuffle-on-token
  * against the per-slice counts (both already token-keyed).
  */
object Drift {

  /** Per-slice token-distribution KL vs the whole corpus.
    * `tokens`: one row per token occurrence (sliceCol, tokCol).
    * Returns (sliceCol, n_tokens, vocab, kl) — kl rounded to `scale`
    * (it is a sum aggregate; raw double sums are shuffle-order
    * nondeterministic). */
  def klBySlice(
      tokens: DataFrame, sliceCol: String, tokCol: String,
      scale: Int = 6): DataFrame = {
    val perSliceTok = tokens.groupBy(col(sliceCol), col(tokCol))
      .agg(count(lit(1)).as("c_st"))
    val perTok = perSliceTok.groupBy(col(tokCol))
      .agg(sum(col("c_st")).as("c_t"))
    val total = perTok.agg(sum(col("c_t")).as("n_total"))
    perSliceTok
      .join(perTok, tokCol)
      .crossJoin(broadcast(total))
      .groupBy(col(sliceCol))
      .agg(
        sum(col("c_st")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        // sum of c_st * ln(c_st / c_t) and the marginal terms are
        // separable: KL = (1/n_s) * sum c_st*ln(c_st/c_t) + ln(N/n_s)
        sum(col("c_st").cast("double") *
          log(col("c_st").cast("double") / col("c_t").cast("double"))).as("__kl_num"),
        first(col("n_total")).as("__n_total"))
      .select(
        col(sliceCol),
        col("n_tokens"),
        col("vocab"),
        round(
          col("__kl_num") / col("n_tokens").cast("double") +
            log(col("__n_total").cast("double") / col("n_tokens").cast("double")),
          scale).as("kl"))
  }
}
