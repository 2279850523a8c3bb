package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite a naive SQL point-in-interval
  * theta join into the binned equi-join plan of
  * [[graft.operators.RangeJoin.pointInInterval]] — so a PLAIN-SQL user
  * writing `... FROM pts JOIN iv ON pts.p >= iv.s AND pts.p < iv.e`
  * (no equi-key ⇒ Spark can only plan CartesianProduct /
  * BroadcastNestedLoopJoin, O(|pts|·|iv|)) transparently gets the
  * O(|pts| + |iv|·span/w) shuffled equi-join instead. This is the one
  * operator family where declarative SQL + stock Catalyst genuinely
  * cannot find the scalable plan (OSS Spark has no range-join
  * optimization), so SURVEY §2.6's "custom Rule[LogicalPlan]: none
  * required — revisit if needed" clause is now exercised: the rule is
  * injectable at session build via [[GraftExtensions]]
  * (`SparkSessionExtensions.injectOptimizerRule`) or per-query via
  * `spark.experimental.extraOptimizations`.
  *
  * OPT-IN by conf: the rule is a no-op unless
  * `spark.graft.rangeJoin.binWidth` is set to a positive long (the bin
  * width in the join columns' own units — pick ≈ the typical interval
  * span, exactly the DataFrame operator's contract). This mirrors the
  * hint-gated design of commercial range-join optimizations: a global
  * silent rewrite of every inequality join would surprise more than it
  * saves.
  *
  * FIRES on: an inner-like join (Inner, or Cross carrying a pushed
  * predicate — the `FROM a, b WHERE …` form), or a LeftSemi/LeftAnti
  * whose PRESERVED side carries the point (the `WHERE [NOT] EXISTS`
  * decontamination-window shape after Catalyst's subquery rewrite),
  * whose condition contains a lower bound
  * `p >= s` / `p > s` and an upper bound `p < e` / `p <= e` on the
  * same expression `p`, where `p` references only one side, `s` and
  * `e` only the other, all three deterministic and of integral type —
  * and NO equi-conjunct links the sides (with one, Spark already plans
  * a fine sort-merge join and the range conjuncts ride along as the
  * residual; rewriting would only add an explode).
  *
  * REWRITE (mirrors RangeJoin.pointInInterval:35, same ⌊x/w⌋
  * arithmetic, exact for integral inputs since |x| < 2⁵³ makes the
  * double division correctly rounded):
  *   points   → Project(output :+ __graft_bin = ⌊p/w⌋)
  *   intervals→ Filter(e > s, or ≥ for an inclusive upper)
  *              → Generate(explode(sequence(⌊s/w⌋, ⌊e′/w⌋)))
  *                where e′ = e−1 for `p < e`, e for `p ≤ e`
  *   join     → Inner on (binₚ = binᵢᵥ AND <the ORIGINAL condition>)
  *   project  → back to the original join's output (bins dropped).
  * Keeping the full original condition as the residual makes the
  * rewrite exact by construction whatever else the condition carries.
  * The non-empty guard drops only interval rows whose bounds are
  * unsatisfiable (`p ≥ s ∧ p < e` with `e ≤ s` matches no p), so no
  * match is lost; a point owns exactly one bin, so none is duplicated.
  *
  * DELIBERATELY NOT REWRITTEN: interval-overlap joins
  * (`s₁ < e₂ AND s₂ < e₁`). For rows where a "(s, e)" pair is not a
  * genuine interval (e ≤ s), the overlap condition can still be
  * satisfiable (e.g. s₁=5, e₁=3 matches any [s₂,e₂) ⊇ {3..5}), so the
  * binned form — which must drop or mis-bin such rows — is NOT
  * transparently exact. A rule that silently changes results on dirty
  * data is worse than a nested loop; overlap stays on the explicit
  * DataFrame API ([[graft.operators.RangeJoin.intervalOverlap]]) whose
  * end-exclusive, e>s contract is documented at the call site.
  *
  * Scale shape at 100 TB: both rewritten sides shuffle once on compact
  * bin keys; no side need fit in memory; the explode factor is
  * span/w + 1 rows per interval. The physical plan is the same
  * SortMergeJoin the hand-written operator gets — judged by the q228
  * gate hash-matching DuckDB's own evaluation of the ORIGINAL SQL. */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BIN_CONF = "spark.graft.rangeJoin.binWidth"

  /** One recognized bound: `point ≥/> b` (lower) or `point </≤ b`
    * (upper), normalized from either comparison orientation. */
  private final case class Bound(point: Expression, b: Expression,
      inclusive: Boolean)

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = try conf.getConfString(BIN_CONF, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (w <= 0) plan
    else plan.transformUp {
      // Inner AND Cross: `FROM a, b WHERE p BETWEEN …` and explicit
      // CROSS JOINs arrive as Cross with the predicate pushed into the
      // condition by the main optimizer batches (which run before
      // user-provided rules); both are inner-like for planning.
      // LeftSemi/LeftAnti: `WHERE [NOT] EXISTS (… p BETWEEN s AND e)`
      // — RewritePredicateSubquery has already turned the subquery
      // into exactly these join types by the time user rules run, and
      // a range-only EXISTS is the same nested-loop hazard (the
      // decontamination-window pattern: "drop every event inside any
      // incident window"). Only the point-side-preserved orientation
      // rewrites — see the guard in rewrite().
      case j @ Join(_, _, Inner | Cross | LeftSemi | LeftAnti, Some(_), _) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)
    val left = j.left
    val right = j.right

    def oneSide(e: Expression): Option[Boolean] = // Some(true) = left
      if (e.references.isEmpty || !e.deterministic) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // With any cross-side equality Spark already extracts equi-keys
    // and plans SMJ/SHJ; the range conjuncts become the join residual.
    // This guard is also what stops the rule re-firing on its own
    // output (the rewrite introduces a bin equality).
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (oneSide(a), oneSide(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (oneSide(a), oneSide(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    // Normalize every comparison into the bounds it implies. A single
    // `x >= y` is BOTH a lower bound on x and an upper bound on y —
    // emit both readings and let the pairing pass sort out roles.
    val lowers = conjuncts.flatMap {
      case GreaterThanOrEqual(p, s) => Seq(Bound(p, s, inclusive = true))
      case GreaterThan(p, s) => Seq(Bound(p, s, inclusive = false))
      case LessThanOrEqual(s, p) => Seq(Bound(p, s, inclusive = true))
      case LessThan(s, p) => Seq(Bound(p, s, inclusive = false))
      case _ => Nil
    }
    val uppers = conjuncts.flatMap {
      case LessThanOrEqual(p, e) => Seq(Bound(p, e, inclusive = true))
      case LessThan(p, e) => Seq(Bound(p, e, inclusive = false))
      case GreaterThanOrEqual(e, p) => Seq(Bound(p, e, inclusive = true))
      case GreaterThan(e, p) => Seq(Bound(p, e, inclusive = false))
      case _ => Nil
    }

    // First (point, lower, upper) triple with a clean side split wins.
    val hit = lowers.iterator.flatMap { lo =>
      uppers.iterator
        .filter(up => up.point.semanticEquals(lo.point))
        .flatMap { up =>
          (oneSide(lo.point), oneSide(lo.b), oneSide(up.b)) match {
            case (Some(pSide), Some(sSide), Some(eSide))
                if sSide == eSide && pSide != sSide &&
                  Seq(lo.point, lo.b, up.b).forall(isIntegral) =>
              Some((lo.point, lo.b, up.b, up.inclusive, pSide))
            case _ => None
          }
        }
    }.take(1).toSeq.headOption

    // Semi/anti joins preserve ONLY the left side: exploding a
    // preserved interval side would duplicate its rows in semi output
    // (one per matching bin) — semantics semi joins must never have.
    // So those join types rewrite only when the point is on the left
    // (the exploded side is then the discarded probe side, where
    // duplication is invisible). Exactness for anti: a left row is
    // dropped iff some exploded row shares its bin AND satisfies the
    // original condition — the same exists-set as the naive join,
    // since every satisfying pair shares the point's one bin; null
    // points match nothing in both forms and stay kept.
    val preservedOnly = j.joinType == LeftSemi || j.joinType == LeftAnti

    hit.filter { case (_, _, _, _, pointOnLeft) =>
      !preservedOnly || pointOnLeft
    }.map { case (p, s, e, upperInclusive, pointOnLeft) =>
      // All arithmetic over LongType, binning over exact doubles —
      // identical to RangeJoin.binned:70 (⌊x/w⌋ exact for integral x).
      def asLong(x: Expression): Expression =
        if (x.dataType == LongType) x else Cast(x, LongType)
      def bin(x: Expression): Expression =
        Floor(Divide(Cast(asLong(x), DoubleType),
          Literal(w.toDouble, DoubleType)))

      val (pointPlan, ivPlan) =
        if (pointOnLeft) (left, right) else (right, left)

      val ptBin = Alias(bin(p), "__graft_bin_pt")()
      val ptSide = Project(pointPlan.output :+ ptBin, pointPlan)

      // Rows with an unsatisfiable bound pair match no point; dropping
      // them is exact and keeps `sequence` ascending.
      val guard =
        if (upperInclusive) GreaterThanOrEqual(asLong(e), asLong(s))
        else GreaterThan(asLong(e), asLong(s))
      val hiBin =
        if (upperInclusive) bin(e)
        else bin(Subtract(asLong(e), Literal(1L)))
      // Optimizer output must be fully resolved: Sequence is
      // TimeZoneAwareExpression, so pin the session zone explicitly
      // (irrelevant for LongType elements, required for resolution).
      val seq = new Sequence(bin(s), hiBin, Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val binAttr = AttributeReference("__graft_bin_iv", LongType,
        nullable = false)()
      val ivSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(binAttr),
        child = Filter(guard, ivPlan))

      val (newLeft, newRight) =
        if (pointOnLeft) (ptSide, ivSide) else (ivSide, ptSide)
      val newCond = And(EqualTo(ptBin.toAttribute, binAttr), cond)
      val newType = if (preservedOnly) j.joinType else Inner
      Project(j.output,
        Join(newLeft, newRight, newType, Some(newCond), j.hint))
    }
  }
  /** Ensure the rule is available on this session (idempotent) — the
    * `experimental.extraOptimizations` route for sessions built
    * without [[GraftExtensions]]; dormant until [[BIN_CONF]] is set. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
}
