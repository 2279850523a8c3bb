package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe for RankFusion vs the corpus-wide-window RRF it
  * replaced (q79/q95 shape): synthetic 5M-doc BM25 list fused with a
  * 2M-doc cosine list. The window formulation funnels every row
  * through ONE task (unpartitioned row_number); rrfTopK heap-prunes
  * per partition and count-aheads only the candidate slice.
  * Run: sbt "runMain graft.tools.ProbeRankFusion" */
object ProbeRankFusion {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val a = spark.range(5000000).select(col("id").as("doc_id"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000000)) / 1000.0).as("s"))
      .repartition(64).cache()
    val b = spark.range(2000000).select(col("id").as("doc_id"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000)) / 1000000.0).as("cos"))
      .repartition(64).cache()
    println("SCALE rows: a=" + a.count() + " b=" + b.count())

    val fused = time("rrfTopK (heap-pruned + count-ahead)") {
      graft.operators.RankFusion.rrfTopK(
        a, "s", "rank_a", b, "cos", "rank_b",
        idCol = "doc_id", k = 20, kRrf = 60, cand = 200).collect()
    }
    val windowed = time("corpus-wide window formulation") {
      a.withColumn("rank_a",
          row_number().over(Window.orderBy(col("s").desc, col("doc_id"))))
        .join(b.withColumn("rank_b",
          row_number().over(Window.orderBy(col("cos").desc, col("doc_id")))), "doc_id")
        .withColumn("rrf", round(
          lit(1.0) / (lit(60) + col("rank_a")) + lit(1.0) / (lit(60) + col("rank_b")), 6))
        .select(col("doc_id"), col("rank_a"), col("rank_b"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20).collect()
    }
    require(fused.toSeq == windowed.toSeq, "fusion != window at 5M")
    println("SCALE identical top-20: true")
    spark.stop()
  }
}
