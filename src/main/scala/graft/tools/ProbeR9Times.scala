package graft.tools

/** One-shot warm-timing probe for the round-9 queries at sf0.1 —
  * the ARCHITECTURE.md "warm query times" record (min of 2 runs, same
  * convention as the bench's steady-state estimate) and an sf0.1 smoke
  * pass over the new surface (committed assets must serve a 10× corpus
  * unchanged; shard/maintenance queries rebuild their stores at the
  * bigger scale). */
object ProbeR9Times {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    val qs = Seq(
      "q179_maxmatch_ids", "q180_unigram_ids", "q181_tokenizer_gates",
      "q182_orc_roundtrip", "q183_shard_manifest", "q184_sql_tokenize",
      "q185_shard_refresh", "q186_tokenizer_fertility",
      "q187_maintained_champions",
      // the round-9 second wave (serving + recipe layer)
      "q188_span_corruption", "q189_html_extract", "q190_bq_rerank",
      "q191_mixture_waterfill", "q192_matryoshka_overlap", "q193_bq_asym",
      "q194_ivf_bq_gate", "q195_recipe_select", "q196_hard_negatives")
    qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      println(f"QUERY=$q warmSecs=$t%.2f")
    }
    spark.stop()
  }
}
