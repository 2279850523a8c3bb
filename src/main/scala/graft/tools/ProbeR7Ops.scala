package graft.tools

import org.apache.spark.sql.functions._

/** Timing probe for the round-6 additions at the bench SF (sf0.1:
  * 5000 docs / 2000 embeddings) — records that none of the new ops
  * hides a scale landmine behind fixture-scale testing.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProbeR7Ops" */
object ProbeR7Ops {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c")
    }
    for (q <- Seq("q106_mmr_rerank", "q108_mmr_batch", "q107_source_drift",
        "q109_embedding_drift", "q110_leakage_split", "q111_novelty",
        "q34_cosine_topk", "q79_hybrid_rrf")) {
      t(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
      t(q + " (warm)")(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
