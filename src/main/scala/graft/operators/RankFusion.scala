package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide ranking WITHOUT a corpus-wide window.
  *
  * The naive Spark formulation of "global rank by score" —
  * `row_number().over(Window.orderBy(score.desc, id))` — is an
  * unpartitioned window: every row shuffles to ONE partition and is
  * sorted there. Fine at fixture scale, fatal at 100 TB (one task sorts
  * the corpus). This operator replaces it for the only case a serving
  * query actually needs — the final answer is a top-k, so only a small
  * candidate slice ever needs its exact global rank:
  *
  *  1. **Heap-pruned candidates**: `orderBy(score.desc, id).limit(cand)`
  *     per score column, which Catalyst plans as `TakeOrderedAndProject`
  *     (per-partition bounded heaps, merge of `partitions * cand` rows —
  *     never a global sort).
  *  2. **Count-ahead exact ranks**: the global rank of candidate c is
  *     `1 + |{rows strictly ahead of c}|` under (score desc, id asc) —
  *     computed by broadcasting the (tiny) candidate thresholds against
  *     one narrow pass of the full score table and counting per
  *     candidate. A broadcast join + hash aggregation: embarrassingly
  *     parallel, no corpus shuffle at all (map-side partial counts
  *     reduce to at most |candidates| rows per task).
  *
  * Exactness for RRF fusion (the q79/q95 shape): a document outside the
  * top-`cand` of EVERY list has rrf < Σ 1/(kRrf+cand), while at least k
  * documents (the top-k of any one list) have rrf ≥ 1/(kRrf+k). With two
  * lists, `cand ≥ kRrf + 2k` makes every outsider strictly worse than k
  * candidates, so the fused top-k over candidates equals the fused top-k
  * over the corpus — the same shortlist-recovers-exact argument the PQ
  * refine path (q63) uses, but with a provable bound instead of a recall
  * floor.
  */
object RankFusion {

  /** Union of the top-`cand` rows of `scores` under each
    * (scoreCol desc, idCol asc) order, deduplicated by id. Each per-column
    * slice is a `TakeOrderedAndProject` (bounded heaps, no global sort);
    * the result is ≤ `scoreCols.size * cand` full rows of `scores`.
    */
  def topCandidates(
      scores: DataFrame, idCol: String, scoreCols: Seq[String], cand: Int): DataFrame = {
    require(scoreCols.nonEmpty, "need at least one score column")
    scoreCols
      .map(sc => scores.orderBy(col(sc).desc, col(idCol)).limit(cand))
      .reduce(_ unionAll _)
      .dropDuplicates(idCol)
  }

  /** `1 + count(rows ahead)` — the row_number a corpus-wide window would
    * assign under (scoreCol desc, idCol asc) — for every candidate row,
    * all score columns in ONE pass of `scores`. Returns the candidate
    * rows with one extra column per entry of `rankNames`.
    *
    * The join is a broadcast nested-loop on the inequality (candidates
    * are tiny by construction); the aggregation's map-side combine caps
    * shuffled rows at |candidates| per task.
    */
  def countAheadRanks(
      scores: DataFrame, cands: DataFrame, idCol: String,
      scoreCols: Seq[String], rankNames: Seq[String]): DataFrame = {
    require(scoreCols.size == rankNames.size, "one rank name per score column")
    // NULL scores sort LAST under the window's `desc` (nulls-last), but
    // a NULL-score candidate would count zero rows "ahead" and claim
    // rank 1 — exclude them from candidacy instead (they can never be
    // in a meaningful top slice; callers wanting them ranked must
    // coalesce first, as the q79/q95 BM25 leg does)
    val nonNull = cands.filter(scoreCols.map(col(_).isNotNull).reduce(_ && _))
    val candKeys = nonNull.select(
      col(idCol).as("__cand_id") +:
        scoreCols.map(sc => col(sc).as(s"__cand_$sc")): _*)
    def ahead(sc: String): Column =
      col(sc) > col(s"__cand_$sc") ||
        (col(sc) === col(s"__cand_$sc") && col(idCol) < col("__cand_id"))
    val anyAhead = scoreCols.map(ahead).reduce(_ || _)
    val cntCols = scoreCols.zip(rankNames).map { case (sc, rn) =>
      sum(when(ahead(sc), 1L).otherwise(0L)).as(s"__cnt_$rn")
    }
    val counts = scores
      .join(broadcast(candKeys), anyAhead)
      .groupBy(col("__cand_id"))
      .agg(cntCols.head, cntCols.tail: _*)
    nonNull
      .join(broadcast(counts), col(idCol) === col("__cand_id"), "left")
      .select(
        nonNull.columns.map(col).toSeq ++
          rankNames.map(rn =>
            (coalesce(col(s"__cnt_$rn"), lit(0L)) + 1L).cast("int").as(rn)): _*)
  }

  /** Exact RRF fusion top-k of two independently-ranked score tables —
    * the q79/q95 hybrid-retrieval shape — with NO corpus-wide window:
    *
    *   rrf(id) = round(1/(kRrf + rankA) + 1/(kRrf + rankB), rrfScale)
    *
    * where rankA/rankB are the row_numbers a corpus-wide window would
    * assign over (scoreA desc, id) on table `a` and (scoreB desc, id)
    * on table `b`, and the output is the top `k` of the INNER join of
    * the two rankings by (rrf desc, id). Candidates are the union of
    * each list's heap-pruned top-`cand`; their exact global ranks come
    * from [[countAheadRanks]] (one narrow pass per table).
    *
    * Exactness needs `cand ≥ kRrf + 2k` (an id outside both top-`cand`
    * slices scores rrf < 2/(kRrf+cand) ≤ 1/(kRrf+k), while the top-k of
    * either surviving list already supplies k candidates at ≥
    * 1/(kRrf+k)) — plus the structural precondition that the top-k ids
    * of at least one list survive the inner join, which holds whenever
    * one table's id space contains the other's (here: every embedding
    * id is a document id). The precondition is CHECKED at runtime
    * against the fused candidate slice (cheap — it is candidate-sized)
    * and violated inputs fail loudly rather than silently diverging
    * from the window formulation.
    */
  def rrfTopK(
      a: DataFrame, scoreA: String, rankAName: String,
      b: DataFrame, scoreB: String, rankBName: String,
      idCol: String, k: Int, kRrf: Int = 60,
      cand: Int = 200, rrfScale: Int = 6): DataFrame = {
    require(cand >= kRrf + 2 * k,
      s"cand=$cand < kRrf + 2k = ${kRrf + 2 * k}: fused top-$k not provably exact")
    // the bound argues on UNROUNDED rrf; after round(rrfScale) an
    // outsider could tie the k-th candidate if the insider/outsider gap
    // falls under the rounding quantum — refuse instead of silently
    // diverging from the window formulation (defaults: gap 4.7e-3 vs
    // quantum 1e-6)
    require(1.0 / (kRrf + k) - 2.0 / (kRrf + cand + 1) > math.pow(10.0, -rrfScale),
      s"kRrf=$kRrf k=$k cand=$cand: rrf gap inside the 1e-$rrfScale rounding quantum; " +
        "raise cand or rrfScale")
    val topA = a.orderBy(col(scoreA).desc, col(idCol)).limit(cand)
    val topB = b.orderBy(col(scoreB).desc, col(idCol)).limit(cand)
    val candIds = topA.select(col(idCol)).unionAll(topB.select(col(idCol))).distinct()
    val rA = countAheadRanks(a, a.join(broadcast(candIds), Seq(idCol)),
      idCol, Seq(scoreA), Seq(rankAName))
    val rB = countAheadRanks(b, b.join(broadcast(candIds), Seq(idCol)),
      idCol, Seq(scoreB), Seq(rankBName))
    val fused = rA.select(col(idCol), col(rankAName))
      .join(rB.select(col(idCol), col(rankBName)), Seq(idCol))
      // candidate-sized (≤ 2·cand rows); settled once so the structural
      // guard below and the returned top-k read the same materialized
      // slice instead of re-running the corpus passes
      .localCheckpoint()
    // RUNTIME GUARD for the structural precondition the exactness
    // argument leans on (class doc): at least one list's top-k ids must
    // survive the inner join — the "k candidates at rrf ≥ 1/(kRrf+k)"
    // floor comes from exactly those rows. With partially-disjoint id
    // spaces (neither table's ids contain the other's) the floor can
    // vanish and the candidate top-k silently diverge from the
    // corpus-wide-window formulation — fail loudly instead. Ranks here
    // are the exact global ranks, so "top-k of list X survives" ≡
    // "k fused rows with rankX ≤ k".
    val okA = fused.filter(col(rankAName) <= k).count() >= k
    def okB = fused.filter(col(rankBName) <= k).count() >= k
    require(okA || okB,
      s"rrfTopK: neither list's global top-$k fully survives the inner id " +
        "join — the id spaces are too disjoint for the candidate bound to " +
        "be exact; widen the join (outer-fuse) or fuse pre-filtered tables")
    fused
      .withColumn("rrf", round(
        lit(1.0) / (lit(kRrf) + col(rankAName)) +
          lit(1.0) / (lit(kRrf) + col(rankBName)), rrfScale))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Convex (weighted-sum) score fusion over min-max-normalized legs —
    * the other standard hybrid-search combiner next to [[rrfTopK]],
    * score-aware where RRF is rank-only: a runaway best match keeps
    * its margin instead of collapsing to rank 1. Unlike RRF no global
    * ranks are needed, so there is no candidate bound to argue: each
    * leg normalizes against its broadcast 1-row (min, max), the two
    * corpus frames inner-join on the id (co-partitioned when both legs
    * derive from the same table), and the fused top-k heap-prunes via
    * TakeOrderedAndProject — no window, no global sort, no collect.
    *
    * A constant leg (min == max) normalizes to 0.0 — it cannot order
    * anything anyway. Fuse TOTAL frames (coalesce a no-match leg to
    * its floor upstream, as q164 does) — ids missing from either leg
    * drop in the inner join. Output: (idCol, norm_a, norm_b, fused),
    * all rounded 6dp post-arithmetic, ordered fused desc with an id
    * tiebreak (the total order the LIMIT needs). */
  def linearTopK(a: DataFrame, scoreA: String, b: DataFrame, scoreB: String,
      idCol: String, k: Int, weightA: Double = 0.5): DataFrame = {
    require(weightA >= 0.0 && weightA <= 1.0, s"weightA $weightA outside [0,1]")
    def norm(df: DataFrame, sc: String, out: String): DataFrame = {
      val mm = df.agg(min(col(sc)).as("__mn"), max(col(sc)).as("__mx"))
      df.crossJoin(broadcast(mm)).select(col(idCol),
        when(col("__mx") > col("__mn"),
          (col(sc) - col("__mn")) / (col("__mx") - col("__mn")))
          .otherwise(lit(0.0)).as(out))
    }
    norm(a, scoreA, "__na").join(norm(b, scoreB, "__nb"), idCol)
      .select(col(idCol),
        round(col("__na"), 6).as("norm_a"),
        round(col("__nb"), 6).as("norm_b"),
        round(lit(weightA) * col("__na") + lit(1.0 - weightA) * col("__nb"), 6)
          .as("fused"))
      .orderBy(col("fused").desc, col(idCol))
      .limit(k)
  }

  /** Exact global ranks for the heap-pruned candidate slice: compose
    * [[topCandidates]] + [[countAheadRanks]]. The caller fuses ranks
    * (RRF or otherwise) over the ≤ `scoreCols.size * cand` result rows
    * — trivially small — instead of windowing the corpus.
    *
    * For a final RRF top-k with constant kRrf over two lists, pass
    * `cand ≥ kRrf + 2k` (see class doc for the exactness bound).
    */
  def exactRanks(
      scores: DataFrame, idCol: String,
      scoreCols: Seq[String], rankNames: Seq[String], cand: Int): DataFrame =
    countAheadRanks(scores, topCandidates(scores, idCol, scoreCols, cand),
      idCol, scoreCols, rankNames)
}
