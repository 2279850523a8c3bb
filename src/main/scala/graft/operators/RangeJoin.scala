package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join via interval BINNING — the standard fix for
  * the join Spark can only plan as a nested loop: `p BETWEEN s AND e`
  * has no equi-key, so the naive form is O(|points|·|intervals|) per
  * equi-group (BroadcastNestedLoopJoin, the q98 class of hazard, but
  * without q98's per-key argmax escape). Binning manufactures the
  * equi-key: points hash to bin ⌊p/w⌋, each interval explodes to the
  * bins it covers (⌊s/w⌋ … ⌊(e−1)/w⌋, end-exclusive), the join runs as
  * a plain shuffled equi-join on (equiKeys, bin), and the exact
  * containment predicate filters the candidates. EXACT, not
  * approximate: a matching pair always shares the point's one bin, and
  * a point has exactly one bin, so no match is lost and none is
  * duplicated — no dedup pass needed.
  *
  * Inputs are INTEGER values (epoch micros, epoch days, plain longs —
  * caller converts; integer-valued doubles inside ±2⁵² are also fine):
  * ⌊x/w⌋ on such x is exact for any integer w ≥ 1 (x is an exact
  * double and IEEE division is correctly rounded, so the quotient
  * cannot cross an integer it is ≥ 1/w away from). Empty intervals
  * (e ≤ s) match nothing and are dropped before the explode — Spark's
  * `sequence` would otherwise RUN DOWNWARD (the bigramInstances guard,
  * same footgun).
  *
  * Pick `binWidth` ≈ the typical interval span: explode factor is
  * span/w + 1 rows per interval (2 bins at w = span), candidate
  * filter selectivity is span/w per bin. At 100 TB both sides shuffle
  * once on compact (keys, bin) rows; no side is required to fit in
  * memory and nothing nested-loops. */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = binned(intervals, startCol, endCol, binWidth)
    p.join(iv, equiKeys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join (both sides intervals, end-exclusive:
    * max(s₁, s₂) < min(e₁, e₂)) — same binning, plus the canonical-bin
    * trick that keeps it dedup-free: two overlapping intervals share
    * every bin their overlap covers, so candidates would duplicate
    * per shared bin; keeping only the bin CONTAINING THE OVERLAP
    * START (⌊max(s₁,s₂)/w⌋ — covered by both sides whenever the
    * overlap is non-empty, since sᵢ ≤ max ≤ min(e)−1 ≤ eᵢ−1) reports
    * each pair exactly once with no distinct pass. Column names of
    * the two sides must not collide apart from `equiKeys`. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      startL: String, endL: String, startR: String, endR: String,
      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = binned(left, startL, endL, binWidth)
    val r = binned(right, startR, endR, binWidth)
    l.join(r, equiKeys :+ "__bin")
      .filter(greatest(col(startL), col(startR)) <
        least(col(endL), col(endR)))
      .filter(col("__bin") ===
        floor(greatest(col(startL), col(startR)) / binWidth).cast("long"))
      .drop("__bin")
  }

  private def binned(intervals: DataFrame, startCol: String,
      endCol: String, binWidth: Long): DataFrame =
    intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor((col(endCol) - 1) / binWidth).cast("long"))))
}
