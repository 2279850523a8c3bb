package graft.tools

import org.apache.spark.sql.functions._

import graft.ann.{IvfIndex, PqIndex}
import graft.operators.KnnExact
import graft.sources.Tables

/** Round-5 probe: find the (nprobe, m, shortlist) point where IVF-PQ
  * shortlist + exact refine recovers the exact top-10 (the q63 pattern)
  * so q64 can carry a full DuckDB oracle. Agreement must hold at both
  * sf0.01 (the driver's correctness gate) and sf0.1 (sanity margin). */
object ProbeQ64 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.GraftSession.local(cpus)
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val e = Tables.embeddings(spark, s"/root/testdata/$sf").cache()
      e.count()
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val exact = KnnExact.knnBatch(e, queries, 10)
        .select("query_id", "neighbor_id", "rank").cache()
      exact.count()
      for (nprobe <- Seq(16); m <- Seq(16); shortlist <- Seq(200, 300)) {
        val t0 = System.nanoTime()
        val pq = PqIndex(m = m, seed = 42L).fit(e)
        val ivf = IvfIndex(nlist = 16, nprobe = nprobe, seed = 42L).fit(e)
        val short = pq.knnJoinIvf(ivf, e, queries, topK = shortlist)
          .select("query_id", "neighbor_id")
        val refined = pq.refine(short, e, queries, topK = 10)
          .select("query_id", "neighbor_id", "rank")
        val diff = refined.exceptAll(exact).count() + exact.exceptAll(refined).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $sf nprobe=$nprobe m=$m shortlist=$shortlist diff=$diff ($secs%.1f s)")
      }
      e.unpersist(); exact.unpersist()
    }
    spark.stop()
  }
}
