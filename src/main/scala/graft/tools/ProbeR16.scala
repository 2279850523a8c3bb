package graft.tools

import org.apache.spark.sql.functions._

/** One-shot RANGE-JOIN scale probe: the binned equi-join vs the naive
  * theta join (BroadcastNestedLoopJoin) as the sides grow. The naive
  * form's work is |points|·|intervals| per equi-group regardless of
  * selectivity; the binned form's is |points| + Σ span/w + |matches|.
  * Small sizes run BOTH and assert set equality (a scale-probe that
  * also re-proves exactness); large sizes run binned only — the naive
  * join is the thing being escaped. KEY CARDINALITY IS FIXED (100):
  * the naive form's intermediate is Σ_k |P_k|·|I_k|, so growing
  * groups — not growing key counts — is the regime that kills it;
  * with scaling keys the equi-join alone keeps groups small and the
  * theta filter looks deceptively linear. Deterministic
  * hash-synthesized timelines: n points and n/10 one-hour intervals
  * over a SPARSE 10-year modulus — match selectivity ~1e-4, so the
  * output stays O(n) and the naive form's cost is pure intermediate
  * blowup (the regime the operator exists for; a dense timeline makes
  * the OUTPUT quadratic and no join shape can beat its own output). */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val hour = 3600000000L
    def pts(n: Long) = spark.range(n).selectExpr(
      "id % 100 AS k", "id AS pid",
      s"CAST((id * 2654435761) % ${87600 * hour} AS LONG) AS p")
      .localCheckpoint()
    def ivs(n: Long) = spark.range(n / 10).selectExpr(
      "id % 100 AS k", "id AS ivid",
      s"CAST((id * 40503) % ${87599 * hour} AS LONG) AS s",
      s"CAST((id * 40503) % ${87599 * hour} + $hour AS LONG) AS e")
      .localCheckpoint()
    for (n <- Seq(100000L, 1000000L, 3000000L, 10000000L)) {
      val (p, iv) = (pts(n), ivs(n))
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"n=$n%9d $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($rows rows)")
      }
      time("binned") {
        graft.operators.RangeJoin.pointInInterval(p, iv, "p", "s", "e",
          binWidth = hour, equiKeys = Seq("k")).count()
      }
      if (n <= 3000000L) time("naive theta") {
        val naive = p.join(iv, "k")
          .filter($"p" >= $"s" && $"p" < $"e").count()
        val binned = graft.operators.RangeJoin.pointInInterval(
          p, iv, "p", "s", "e", hour, Seq("k")).count()
        require(naive == binned, s"mismatch: naive $naive vs binned $binned")
        naive
      }
      p.unpersist(); iv.unpersist()
    }
    spark.stop()
  }
}
