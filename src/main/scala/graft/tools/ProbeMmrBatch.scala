package graft.tools

import org.apache.spark.sql.functions._

/** Driver-memory probe for the distributed batch-MMR greedy (round-7
  * item: `Mmr.rerankBatch` no longer collects |queries|·cand candidate
  * vectors; the greedy runs in `flatMapGroups` on executors). Runs a
  * 10k-query batch and reports driver-heap growth across the action —
  * under the old collect path the candidate slice alone (10k × 20 cand
  * × dim floats + Row boxing) had to land on the driver; now only the
  * 4-column result rows (10k × k) come back for the count.
  * Run: sbt "runMain graft.tools.ProbeMmrBatch" */
object ProbeMmrBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_MMR_QUERIES", "10000").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    // 10k query vectors: replicate the embedding table's vectors under
    // fresh qids so the batch is large while the corpus stays fixture-sized.
    val base = e.limit(100).select(col("vec_id"), col("embedding")).cache()
    base.count()
    val queries = spark.range(nQueries).toDF("qid")
      .withColumn("vec_id", col("qid") % 100)
      .join(broadcast(base), "vec_id")
      .select(col("qid"), col("embedding").as("qvec"))

    def heapUsed(): Long = {
      val rt = Runtime.getRuntime
      System.gc(); Thread.sleep(200); System.gc()
      rt.totalMemory() - rt.freeMemory()
    }
    val before = heapUsed()
    val t0 = System.nanoTime()
    val out = graft.operators.Mmr.rerankBatch(
      e, queries, k = 3, lambda = 0.7, cand = 20, queryId = "qid")
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val after = heapUsed()
    println(f"[probe] mmr_batch queries=$nQueries rows=$n time=$secs%.2fs " +
      f"driver_heap_before=${before / 1048576}MiB after=${after / 1048576}MiB " +
      f"delta=${(after - before) / 1048576}MiB")
    spark.stop()
  }
}
