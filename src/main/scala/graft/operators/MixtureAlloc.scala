package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Epoch-capped mixture allocation — the "data recipe" step that turns
  * target mixture priorities into per-domain token draws under
  * availability caps (the ≤N-epochs rule of LLaMA-style pretraining
  * recipes): maximize proportionality a_i ∝ p_i subject to a_i ≤ cap_i
  * and Σa_i = B.
  *
  * The optimum is waterfilling — a_i = min(cap_i, p_i·T) with the water
  * level T set so the total hits B — and it has a CLOSED FORM over
  * prefix sums, no iteration: sort domains by cap/p ascending (the
  * order in which caps bind as T rises); domain i is capped iff its cap
  * binds below the water level of everything before it,
  *   cap_i · (P − Σ_{j<i} p_j)  <  p_i · (B − Σ_{j<i} cap_j),
  * cross-multiplied so the decision is EXACT integer arithmetic (no
  * float water level; a DuckDB oracle replays it bit-for-bit). Once one
  * domain is uncapped every later one is too (T is non-increasing in
  * the prefix — the standard exchange argument), which is what makes
  * the per-row predicate with whole-prefix sums correct.
  *
  * Plan shape: one single-partition window over |domains| rows (domain
  * counts are report-sized — even a web crawl has ~1e5 registrable
  * domains, not 1e8) plus two broadcast scalar joins; the corpus-sized
  * work (counting cap_i) happens BEFORE this operator as an ordinary
  * partial agg. Uncapped draws use integer division (floor), so
  * Σ alloc ≤ B with at most |domains| tokens of slack — budget slack,
  * never overdraw.
  */
object MixtureAlloc {

  /** Waterfill `budget` over (domainCol, capCol: BIGINT, pCol: integer
    * priority > 0). Returns one row per domain:
    * (domain, p, cap, capped, alloc, share = round(alloc/B, 6)). */
  def waterfill(domains: DataFrame, budget: Long,
      domainCol: String = "domain", capCol: String = "cap",
      pCol: String = "p"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // p ≤ 0 would flip the cross-multiplied capped predicate's
    // direction and poison the bind-order sort — fail fast instead of
    // allocating silently wrong (domains is report-sized, the check is
    // one tiny job)
    require(domains.filter(col(pCol) <= 0).isEmpty,
      s"every $pCol priority must be positive")
    val totals = domains.agg(sum(col(pCol)).cast("long").as("__P"))
    // exclusive prefix sums in bind order (cap/p asc, domain tiebreak)
    val pre = Window
      .orderBy(col(capCol).cast("double") / col(pCol), col(domainCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = domains.crossJoin(broadcast(totals))
      .withColumn("__cumcap", coalesce(sum(col(capCol)).over(pre), lit(0L)))
      .withColumn("__cump", coalesce(sum(col(pCol)).over(pre), lit(0L)).cast("long"))
      .withColumn("capped",
        col(capCol) * (col("__P") - col("__cump")) <
          col(pCol) * (lit(budget) - col("__cumcap")))
    val capAgg = flagged.agg(
      coalesce(sum(when(col("capped"), col(capCol))), lit(0L)).as("__C"),
      coalesce(sum(when(col("capped"), col(pCol))), lit(0L)).cast("long").as("__Pc"))
    flagged.crossJoin(broadcast(capAgg))
      .withColumn("alloc", when(col("capped"), col(capCol)).otherwise(
        expr(s"$pCol * (CAST($budget AS BIGINT) - __C) DIV (__P - __Pc)")))
      .select(col(domainCol), col(pCol), col(capCol), col("capped"),
        col("alloc"),
        round(col("alloc").cast("double") / lit(budget.toDouble), 6).as("share"))
  }
}
