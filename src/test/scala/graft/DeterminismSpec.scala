package graft

/** Partitioning-invariance: a query whose OUTPUT depends on
  * `spark.sql.shuffle.partitions` would hash-match the oracle on the
  * driver's configuration and silently diverge on a 1000-executor
  * cluster. The repo-wide disciplines that guarantee invariance —
  * aggregate doubles rounded before comparison, no order-dependent
  * folds over shuffled data, seeded hashes instead of RNG state —
  * are exactly what this spec checks end to end, over a cross-section
  * of query families (agg, window, dedup pair mining, hash split,
  * decontamination, NB training, snapshot diff, triplets, skew
  * report).
  */
class DeterminismSpec extends SparkSpec {

  test("query outputs are invariant to the shuffle-partition count") {
    val qs = Seq(
      "q01_pricing_summary", "q04_order_revenue", "q05_window_top3",
      "q30_minhash_pairs", "q47_hash_split", "q69_decontaminate",
      "q94_quality_floor", "q107_source_drift", "q141_nb_classifier",
      "q142_snapshot_diff", "q145_contrastive_triplets", "q147_skew_report",
      "q148_join_size", "q149_padding_curve", "q151_pipeline_funnel",
      "q152_quantile_buckets", "q155_temperature_mix", "q158_dedup_dashboard",
      "q160_stream_maintain", "q162_sql_curation", "q163_dsir_select",
      "q164_hybrid_linear", "q165_distinct_ngrams", "q166_top_ngram",
      "q167_dup_ngram", "q190_bq_rerank", "q191_mixture_waterfill",
      "q192_matryoshka_overlap", "q195_recipe_select")
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[String]] =
      qs.map(q => q -> SparkEntry.queries(q)(spark, sf0001)
        .collect().map(_.toString).sorted.toSeq).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val narrow = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val wide = runAll()
      qs.foreach { q =>
        assert(narrow(q).nonEmpty, s"$q returned nothing")
        assert(narrow(q) === wide(q), s"$q output depends on partitioning")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }
}
