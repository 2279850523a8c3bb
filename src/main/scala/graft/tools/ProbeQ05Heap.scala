package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Measure q05's per-key top-3: corpus-wide window (current plan) vs
  * TopKPerKey heap-prune + bounded rank window. The window version
  * sorts every (suppkey-hash) partition fully; the heap version keeps
  * 3 rows per key before any sort — O(n log k) vs O(n log n) — and the
  * rank window then sees ≤ 3 rows per key. Results must be identical
  * (same total-order tiebreak). */
object ProbeQ05Heap {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = Tables.lineitem(spark, d).localCheckpoint()
    def windowed() = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"))
    }
    def heaped() = graft.plans.TopKPerKey.rankedTopK(
        li, "l_suppkey", Seq("l_shipdate", "l_orderkey", "l_linenumber"), 3)
      .select(col("l_suppkey"), col("rank").as("rn"),
        col("l_orderkey"), col("l_linenumber"))
    // identical outputs first
    val diff = windowed().exceptAll(heaped()).count() +
      heaped().exceptAll(windowed()).count()
    println(s"Q05HEAP identical=${diff == 0}")
    for ((name, f) <- Seq("window" -> (() => windowed()),
        "heap" -> (() => heaped()))) {
      val times = (1 to 5).map { _ =>
        val t = System.nanoTime(); f().count(); (System.nanoTime() - t) / 1e9
      }
      println(f"Q05HEAP $name min_s=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
