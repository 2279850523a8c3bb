package graft.tools

import org.apache.spark.sql.functions._

/** Timing probe for the round's additions (q139–q143) — the new
  * queries at the bench SF plus synthetic stresses sized to expose
  * shape mistakes fixtures hide: a 100k-doc corpus against a 500-doc
  * benchmark for the Bloom-vs-exact decontamination delta, NB training
  * over 100k docs, dHash fingerprint+pair mining over 50k images, and
  * a 1M-row snapshot diff. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProbeR10Ops" */
object ProbeR10Ops {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def stealTicks(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().next().trim.split("\\s+")(8).toLong
        finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1L }
    def t(name: String)(f: => Long): Unit = {
      val s0 = stealTicks()
      val t0 = System.nanoTime(); val c = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-40s $dt%6.2f s rows=$c steal=${stealTicks() - s0}")
    }
    for (q <- Seq("q139_bloom_decontaminate", "q140_phash_neardup",
        "q141_nb_classifier", "q142_snapshot_diff", "q143_takedown",
        "q144_normalize_text", "q145_contrastive_triplets",
        "q146_incremental_index", "q147_skew_report", "q148_join_size",
        "q149_padding_curve", "q150_vector_drop_sync",
        "q151_pipeline_funnel", "q152_quantile_buckets",
        "q153_pii_audit", "q154_lang_confusion", "q155_temperature_mix",
        "q156_quality_sweep", "q157_nb_confusion", "q158_dedup_dashboard",
        "q159_stride_chunks")) {
      t(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
      t(q + " (warm)")(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }

    // 100k-doc train corpus vs a 500-doc benchmark where contamination
    // is RARE (the production regime): docs are token-wise unique
    // hash-noise, and exactly 100 bench docs are verbatim copies of
    // train docs. The Bloom prefilter should then kill almost every
    // train shingle before the join, while the exact path shuffles all
    // of them — the delta IS the operator's value.
    def noiseText(idc: org.apache.spark.sql.Column) = concat_ws(" ",
      (0 until 24).map(k =>
        pmod(xxhash64(idc, lit(k)), lit(99991)).cast("string")): _*)
    val train = spark.range(100000).select(
        col("id").as("doc_id"), noiseText(col("id")).as("text"))
      .localCheckpoint()
    val bench = spark.range(500).select(
        (col("id") + 5000000L).as("doc_id"),
        when(col("id") < 100, noiseText(col("id") * 1000L)) // copies of train docs
          .otherwise(noiseText(col("id") + 7777777L)).as("text"))
      .localCheckpoint()
    t("contaminationPairs exact 100k x 500") {
      graft.operators.TextDedup.contaminationPairs(
        train, bench, "doc_id", "text", ngram = 3, minFrac = 0.3).count()
    }
    t("contaminationPairsBloom 100k x 500") {
      graft.operators.TextDedup.contaminationPairsBloom(
        train, bench, "doc_id", "text", ngram = 3, minFrac = 0.3).count()
    }
    // the scale metric the Bloom buys: rows entering the shingle join
    // (at 100 TB this is the shuffle the prefilter deletes; wall-clock
    // at 100k docs is dominated by fixed job overheads either way)
    import graft.operators.TextDedup.shingleHashes
    t("train shingles entering exact join") {
      train.select(explode(shingleHashes(col("text"), 3))).count()
    }
    t("train shingles surviving bloom") {
      val bh = bench.select(explode(shingleHashes(col("text"), 3)).as("h")).distinct()
      val bloom = bh.stat.bloomFilter("h", math.max(bh.count(), 64L), 0.01)
      val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
      val mc = org.apache.spark.sql.GraftBridge.column(
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(bos.toByteArray),
          org.apache.spark.sql.GraftBridge.expression(col("sh"))))
      train.select(explode(shingleHashes(col("text"), 3)).as("sh"))
        .filter(mc).count()
    }

    t("nbClassifierScores 100k docs") {
      graft.operators.TextAnalysis.nbClassifierScores(
        train, "doc_id", "text", pmod(col("doc_id"), lit(3)) === 0).count()
    }

    // 50k group-structured images: encode+decode+dHash is the narrow
    // stage; pair mining must stay banded (no all-pairs blowup at 50k)
    val imgs = spark.range(50000).toDF("id")
      .withColumn("payload",
        graft.operators.Multimodal.syntheticGroupPng(col("id"), 5000))
    t("dHash fingerprints 50k images") {
      imgs.select(col("id"),
        graft.operators.Multimodal.imageDHash(col("payload")).as("fp")).count()
    }
    val fps = imgs.select(col("id"),
        graft.operators.Multimodal.imageDHash(col("payload")).as("fp"))
      .localCheckpoint()
    t("banded dHash pairs 50k images") {
      graft.operators.TextDedup.simhashPairsBandedFp(fps, maxHamming = 6).count()
    }

    // incremental BM25 vs rebuild at 100k docs: append pays
    // delta-tokenize + index-sized terms/stats re-aggregation; rebuild
    // re-tokenizes the whole corpus. The gap is the operator's value
    // and should widen linearly with corpus/delta ratio.
    val delta = spark.range(100000, 101000).select(
        col("id").as("doc_id"), noiseText(col("id")).as("text"))
      .localCheckpoint()
    t("bm25 buildIndex 100k docs") {
      graft.operators.Bm25.buildIndex(train, "graft_probe_incr", buckets = 8)
      spark.table("graft_probe_incr_doclens").count()
    }
    t("bm25 appendDocs 1k delta") {
      graft.operators.Bm25.appendDocs(spark, "graft_probe_incr", delta, buckets = 8)
      spark.table("graft_probe_incr_doclens").count()
    }

    t("describeSkew 10M rows, zipf-ish keys") {
      val big = spark.range(10000000).select(
        (pmod(xxhash64(col("id")), lit(10000)) * pmod(xxhash64(col("id")), lit(97)) / 97).cast("long").as("k"))
      graft.operators.SkewJoin.describeSkew(big, Seq("k")).count()
    }

    // 1M-row snapshot diff: one id-keyed full-outer join, narrow compare
    val oldSnap = spark.range(1000000).select(col("id"),
      (col("id") * 31 % 1000).cast("string").as("text"))
    val newSnap = spark.range(30, 1000030).select(col("id"),
      when(pmod(col("id"), lit(50)) === 0, lit("rev"))
        .otherwise((col("id") * 31 % 1000).cast("string")).as("text"))
    t("snapshotDiff 1M rows") {
      graft.operators.SnapshotDiff.diff(oldSnap, newSnap, "id", Seq("text"))
        .groupBy("status").count().count()
    }
    spark.stop()
  }
}
