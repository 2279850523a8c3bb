package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scale probe for the incremental BM25 append (round-8 item #1): feed
  * sf0.1's documents into a standing index in 10 equal batches and time
  * each appendDocs. The incremental contract says per-append cost
  * follows the DELTA (batch postings + a vocab-sized terms merge), not
  * the corpus — the curve must stay flat while the standing index grows
  * 10×. Before round 8, appendDocs re-aggregated the FULL postings and
  * doclens tables per append (O(corpus) per delta), so this curve grew
  * with the store; the delta-merge refresh flattens it. */
object ProbeBm25Append {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val n = 10
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val step = (maxId + n) / n
    // seed with batch 0 so every later call is a pure append
    graft.operators.Bm25.buildIndex(
      docs.filter(col("doc_id") < step), "graft_bm25_probe", buckets = 8)
    for (k <- 1 until n) {
      val batch = docs.filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
        .localCheckpoint()
      val t0 = System.nanoTime()
      graft.operators.Bm25.appendDocs(spark, "graft_bm25_probe", batch, buckets = 8)
      val s = (System.nanoTime() - t0) / 1e9
      val postings = spark.table("graft_bm25_probe_postings").count()
      println(f"BM25APPEND batch=$k append_s=$s%.2f standing_postings=$postings")
    }
    spark.stop()
  }
}
