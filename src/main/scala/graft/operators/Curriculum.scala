package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curriculum ordering for training-data pipelines (Bengio et al.,
  * "Curriculum Learning", ICML 2009): score every document with a
  * deterministic difficulty proxy, cut the corpus into quantile
  * phases (easy → hard), and fix a total order within each phase so
  * the data loader's read order is reproducible.
  *
  * The difficulty proxy is built from cheap lexical signals that are
  * monotone with reading difficulty and exactly mirrorable in ANSI
  * SQL (so the whole operator rides the driver's hash gate, unlike
  * perplexity-based ordering which would drag a model in):
  * mean word length, lexical diversity (type-token ratio), and log
  * document length. One projection + two windows; at scale the score
  * is a narrow codegen'd map and the phase cut is one ntile exchange —
  * the same shuffle any global sort of the corpus would pay, which is
  * the operator's semantic floor (a curriculum IS a global order).
  */
object Curriculum {

  /** Per-document difficulty: 0.5·mean_word_len + 3·(1 − ttr) +
    * ln(1 + n_tok), on whitespace tokens of the lower-trimmed text.
    * Deterministic, unrounded doubles (both engines compute the same
    * IEEE expression). */
  def difficulty(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    docs.select(
        col(idCol),
        toks.as("__toks"),
        size(toks).cast("long").as("n_tok"))
      .select(
        col(idCol), col("n_tok"),
        (aggregate(col("__toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / col("n_tok")).as("mean_wlen"),
        (size(array_distinct(col("__toks"))).cast("double") / col("n_tok"))
          .as("ttr"))
      .withColumn("difficulty",
        lit(0.5) * col("mean_wlen") + lit(3.0) * (lit(1.0) - col("ttr"))
          + log(lit(1.0) + col("n_tok")))
  }

  /** Quantile-phase curriculum: `numPhases` ntile cuts over the
    * (difficulty, id) total order — phase 1 is the easiest slice —
    * plus a deterministic rank within each phase. Output: (phase,
    * rank_in_phase, id, n_tok, difficulty-signals).
    *
    * NO unpartitioned window (`ntile().over(Window.orderBy(…))` would
    * shuffle the corpus to one task — the exact anti-pattern
    * [[RankFusion]] documents): the global order comes from Spark's
    * range-partitioned `sort` (parallel), positions from
    * [[graft.plans.GlobalOrder]] (the zipWithIndex per-partition-offset
    * pass), and phase / rank-in-phase are then pure ARITHMETIC on
    * the position — ntile's exact definition (first n mod k tiles get
    * ⌈n/k⌉ rows), no second shuffle at all. */
  def phases(docs: DataFrame, numPhases: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(numPhases >= 1, s"numPhases must be >= 1, got $numPhases")
    // row count is metadata-cheap on a parquet-backed corpus and fixes
    // the tile arithmetic; difficulty() is row-preserving
    val n = docs.count()
    // rank on the 4dp-rounded score with an id tie-break: ln() is not
    // ulp-identical across libms, so an unrounded order could flip
    // adjacent near-ties between engines; rounding makes the sort key
    // reproducible and the id makes it total (q73's discipline — and a
    // rounding TIE is measure-zero for a log-bearing double, unlike
    // the exact integer ratios mean_wlen/ttr, which therefore stay
    // unrounded: they're bit-identical IEEE divisions on both engines)
    val withPos = graft.plans.GlobalOrder.withPositions(
      difficulty(docs, idCol, textCol)
        .withColumn("difficulty", round(col("difficulty"), 4)),
      Seq(col("difficulty"), col(idCol)))
    val k = numPhases.toLong
    val q = n / k; val r = n % k
    val cut = r * (q + 1) // rows 1..cut fill the (q+1)-sized tiles
    val pos = col("__pos")
    // greatest(q,1): the q=0 (n < numPhases) corpus takes the first
    // branch for every row; the guard only keeps ANSI division happy
    val qSafe = lit(math.max(q, 1L))
    withPos
      .withColumn("phase",
        when(pos <= cut, (pos - 1) / (q + 1) + 1)
          .otherwise(lit(r) + (pos - cut - 1) / qSafe + 1).cast("int"))
      .withColumn("rank_in_phase",
        when(pos <= cut, (pos - 1) % (q + 1) + 1)
          .otherwise((pos - cut - 1) % qSafe + 1).cast("int"))
      .select(col("phase"), col("rank_in_phase"), col(idCol),
        col("n_tok"), col("mean_wlen"), col("ttr"), col("difficulty"))
  }
}
