package graft.tools

import org.apache.spark.sql.functions._

/** Timing probe for this round's additions — the new queries at the
  * bench SF plus a 100k-doc synthetic stress of the text ops (fixture
  * sf0.1 is only 5000 docs; the probe exists to catch row-shape
  * mistakes that fixtures hide). Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProbeR9Ops" */
object ProbeR9Ops {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    // per-measurement hypervisor-steal delta: this round's host shows
    // rotating steal bursts that inflate a single reading 5-70x — a
    // probe line with thousands of steal ticks is contaminated and
    // says so itself (same discipline as Bench's steal_ticks)
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
      println(f"[probe] $name%-36s $dt%6.2f s rows=$c steal=${stealTicks() - s0}")
    }
    for (q <- Seq("q131_gif_video", "q132_dup_span_removal",
        "q133_freq_stream", "q134_gif_frame_sample", "q135_token_budget_mix")) {
      t(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
      t(q + " (warm)")(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }
    // 100k synthetic docs, ~40 tokens each, heavy cross-doc repetition
    // (every doc shares one of 500 boilerplate blocks) — the dup-span
    // workload that matters, and skewed enough to expose a hot-segment
    // task if the argmin were a window
    val docs = spark.range(100000).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          lit("block"), (col("id") % 500).cast("string"),
          lit("alpha beta gamma delta epsilon zeta eta theta"),
          col("id").cast("string"),
          lit("iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
          (col("id") * 7 % 1000).cast("string"),
          lit("phi chi psi omega one two three four five six seven eight"))
          .as("text"))
      .localCheckpoint()
    t("removeDupSpans 100k docs") {
      graft.operators.TextDedup.removeDupSpans(docs, "doc_id", "text", window = 8)
        .count()
    }
    t("tokenBudgetSample 100k docs") {
      graft.operators.WeightedSample.tokenBudgetSample(
        docs.withColumn("grp", (col("doc_id") % 4).cast("string")),
        "grp", "doc_id", size(split(col("text"), " ")).cast("long"),
        Map("0" -> 200000L, "1" -> 100000L, "2" -> 50000L, "3" -> 400000L))
        .count()
    }
    graft.streaming.FreqStream.initStore(spark, "probe_r9_freq")
    t("FreqStream 100k docs, 10 batches") {
      graft.streaming.FreqStream.replayInBatches(docs, "probe_r9_freq", 10)
      graft.streaming.FreqStream.counts(spark, "probe_r9_freq").count()
    }
    t("FreqStream compact + serve") {
      graft.streaming.FreqStream.compact(spark, "probe_r9_freq")
      graft.streaming.FreqStream.topK(spark, "probe_r9_freq", 20).count()
    }
    spark.stop()
  }
}
