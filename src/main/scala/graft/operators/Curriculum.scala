package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The difficulty proxy as ONE scalar column — the SQL-frontend
    * face (`difficulty_score(text)` in the registry): exactly the
    * 0.5·mean_word_len + 3·(1 − ttr) + ln(1 + n_tok) expression
    * [[difficulty]] computes from its component columns. The two
    * forms are certified equivalent by q210 sharing q200's oracle
    * string verbatim under the driver's hash gate. */
  def difficultyScore(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val nTok = size(toks).cast("long")
    (lit(0.5) * (aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / nTok)
      + lit(3.0) * (lit(1.0)
        - size(array_distinct(toks)).cast("double") / nTok)
      + log(lit(1.0) + nTok))
  }

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

  /** SOURCE-INTERLEAVED curriculum: within each difficulty phase the
    * read order rotates across sources (all sources' easiest docs
    * first, then their second-easiest, …), so a phase never serves one
    * domain in a block — the dataloader-balance requirement stacked on
    * the easy→hard one.
    *
    * Still no windows: grouped ranks come from [[graft.plans.GlobalOrder]]
    * sorts plus EXACT group offsets — `min(__pos)` per (phase, source)
    * is the group's first global position (the groups are
    * phases × sources, a driver-sized broadcast), and phase offsets
    * are pure ntile arithmetic. The oracle replays the same order with
    * real nested row_number windows, so the gate certifies the
    * offsets ≡ windows equivalence. */
  def interleaved(docs: DataFrame, numPhases: Int, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    val n = docs.count()
    val ph = phases(docs, numPhases, idCol, textCol)
      .join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))
    val pos2 = graft.plans.GlobalOrder.withPositions(ph,
      Seq(col("phase"), col(sourceCol), col("difficulty"), col(idCol)))
    val starts = pos2.groupBy(col("phase"), col(sourceCol))
      .agg(min(col("__pos")).as("__start"))
    val withSrcRank = pos2
      .join(broadcast(starts), Seq("phase", sourceCol))
      .withColumn("src_rank", (col("__pos") - col("__start") + 1).cast("int"))
      .drop("__pos", "__start")
    val pos3 = graft.plans.GlobalOrder.withPositions(withSrcRank,
      Seq(col("phase"), col("src_rank"), col(sourceCol)))
    val k = numPhases.toLong
    val q = n / k; val r = n % k
    // exclusive offset of phase p under ntile sizing: (p-1) full tiles,
    // the first min(p-1, r) of which carry the +1 remainder row
    val off = (col("phase") - 1) * q + least(col("phase") - 1, lit(r))
    pos3
      .withColumn("read_pos", (col("__pos") - off).cast("int"))
      .select(col("phase"), col("read_pos"), col(idCol), col(sourceCol),
        col("src_rank"), col("difficulty"))
  }
}
