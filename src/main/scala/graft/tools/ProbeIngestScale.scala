package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scale probe for the ingest-dedup standing store: feed sf0.1's
  * documents (5000) in 10 batches and time each admitBatch — the
  * serving contract says per-batch cost follows the BATCH (matched
  * bands), not the store, so the curve should stay flat while the
  * store grows 10×. */
object ProbeIngestScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val n = 10
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val step = (maxId + n) / n
    graft.streaming.IngestDedup.initStore(spark, "graft_scale_probe")
    for (k <- 0 until n) {
      val batch = docs.filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
      val t0 = System.nanoTime()
      val admitted = graft.streaming.IngestDedup
        .admitBatch(batch, "graft_scale_probe").count()
      val storeRows = spark.table("graft_scale_probe_bands").count()
      println(f"INGESTSCALE batch=$k admit_s=${(System.nanoTime() - t0) / 1e9}%.2f " +
        s"admitted=$admitted store_band_rows=$storeRows")
    }
    graft.streaming.IngestDedup.initStore(spark, "graft_scale_probe")
    spark.stop()
  }
}
