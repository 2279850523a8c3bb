package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Per-wave cost of the dedup-gated ingestion loop at sf0.1: 10
  * id-ordered add waves through applyGatedUpserts. Admission probes
  * are batch-bounded (broadcast band join) and the index apply is
  * O(delta), so the curve should stay flat while both standing stores
  * grow 10x. */
object ProbeGatedIngest {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val n = 10
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val step = (maxId + n) / n
    graft.streaming.IndexMaintenance.initStores(spark, "graft_gi_probe")
    graft.streaming.IngestDedup.initStore(spark, "graft_gi_sigs")
    graft.sources.Sinks.dropTable(spark, "graft_gi_sigs_pending_rm")
    for (k <- 0 until n) {
      val wave = docs.filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val applied = graft.streaming.IndexMaintenance.applyGatedUpserts(
        spark, "graft_gi_probe", "graft_gi_sigs", wave, ver = k + 1L, buckets = 8)
      val admitted = applied.filter(col("status") === "added").count()
      val s = (System.nanoTime() - t0) / 1e9
      val idx = spark.table("graft_gi_probe_doclens").count()
      println(f"GATED wave=$k apply_s=$s%.2f admitted=$admitted indexed_docs=$idx")
    }
    spark.stop()
  }
}
