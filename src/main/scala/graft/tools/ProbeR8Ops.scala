package graft.tools

/** Timing probe for the round-7 additions at the bench SF (sf0.1:
  * 5000 docs / 2000 embeddings / 100k events) — records that none of
  * the new ops hides a scale landmine behind fixture-scale testing.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProbeR8Ops" */
object ProbeR8Ops {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c")
    }
    for (q <- Seq("q119_bpe_token_ids", "q120_wav_stats",
        "q121_forest_compaction", "q122_funnel_4stage", "q123_funnel_windowed",
        "q108_mmr_batch", "q87_ingest_dedup", "q93_vec_ingest_dedup")) {
      t(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
      t(q + " (warm)")(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
