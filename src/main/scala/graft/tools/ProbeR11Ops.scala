package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-8 measurements.
  *
  * 1. Streaming index maintenance at sf0.1: documents fed through
  *    `IndexMaintenance.applyUpserts` in 10 pure-add waves — the
  *    per-wave cost must stay flat while the standing index grows 10×
  *    (incremental appendDocs + the batch-restricted fingerprint
  *    probe), unlike a per-wave rebuild. Then one UPDATE-carrying wave
  *    to price the documented change-forced compaction.
  *
  * 2. Warm timings for the new round-8 queries at sf0.1.
  */
object ProbeR11Ops {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val n = 10
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val step = (maxId + n) / n
    graft.streaming.IndexMaintenance.initStores(spark, "graft_im_probe")
    for (k <- 0 until n) {
      val wave = docs.filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
        .localCheckpoint()
      val t0 = System.nanoTime()
      graft.streaming.IndexMaintenance.applyUpserts(
        spark, "graft_im_probe", wave, ver = k + 1L, buckets = 8)
      val s = (System.nanoTime() - t0) / 1e9
      val postings = spark.table("graft_im_probe_postings").count()
      println(f"IMADD wave=$k apply_s=$s%.2f standing_postings=$postings")
    }
    // one update wave: 5% of docs revised in place → classification +
    // tombstone + forced compaction + delta re-append
    val upd = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
      .withColumn("text", concat(col("text"), lit(" v2"))).localCheckpoint()
    val t1 = System.nanoTime()
    graft.streaming.IndexMaintenance.applyUpserts(
      spark, "graft_im_probe", upd, ver = n + 1L, buckets = 8)
    println(f"IMUPD docs=${upd.count()} apply_s=${(System.nanoTime() - t1) / 1e9}%.2f")

    for (q <- Seq("q160_stream_maintain", "q161_audio_formats",
        "q162_sql_curation", "q163_dsir_select", "q164_hybrid_linear")) {
      val warm = (1 to 2).map { _ =>
        val t = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, d).count()
        (System.nanoTime() - t) / 1e9
      }.min
      println(f"R11 $q warm_s=$warm%.2f")
    }
    spark.stop()
  }
}
