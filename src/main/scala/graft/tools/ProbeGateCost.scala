package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.CountStore
import graft.streaming.{IndexMaintenance, IngestDedup}

/** One-shot gate-cost breakdown for the fold queries (q245/q252
  * shape): which section of a gated wave pays the wall — the
  * classification+admission machinery, the BM25 apply, the fold, or
  * the final equality probes. Run at the gate's own fixture scale
  * (sf0.01, local[8], shuffle=8) so the numbers transfer. */
object ProbeGateCost {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }
    val idx = "pgc_idx"; val sig = "pgc_sigs"; val log = "pgc_log"
    val hll = "pgc_hll"; val hh = "pgc_hh"; val kll = "pgc_kll"
    IndexMaintenance.initStores(spark, idx)
    IngestDedup.initStore(spark, sig)
    graft.sources.Sinks.dropTable(spark, sig + "_pending_rm")
    for (t <- Seq(log, log + "_applied",
        hll + "_hll", hll + "_hll_params", hll + "_stale",
        hh + "_hh", hh + "_hh_n", hh + "_hh_params", hh + "_stale",
        kll + "_kll", kll + "_kll_params", kll + "_stale"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log, hll, hh, kll))
      CountStore.setBuilding(spark, n, on = false)
    val corpus = graft.sources.Tables.documents(spark, d)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .localCheckpoint()
    val fold = IndexMaintenance.countStoreFold(spark,
      sketchStore = Some((hll, "lang")),
      hhStore = Some((hh, "source", 100000)),
      quantileStore = Some((kll, "source", "n_chars")),
      buckets = 8, refitBacklog = 3)
    def dels(r: Int) = corpus.filter(col("doc_id") % 20 === r)
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("source"),
        lit(null).cast("long").as("n_chars"))
    // wave 1 with NO fold vs WITH fold isolates the fold's share
    time("wave1 bootstrap (gated, WITH fold)") {
      IndexMaintenance.applyGatedUpserts(spark, idx, sig, corpus, ver = 1L,
        buckets = 8, docFold = Some((log, fold)))
    }
    time("wave2 delete-only (deferred fold)") {
      IndexMaintenance.applyGatedUpserts(spark, idx, sig, dels(4), ver = 2L,
        buckets = 8, docFold = Some((log, fold)))
    }
    time("wave3 delete-only (deferred fold)") {
      IndexMaintenance.applyGatedUpserts(spark, idx, sig, dels(8), ver = 3L,
        buckets = 8, docFold = Some((log, fold)))
    }
    time("wave4 delete-only (threshold refit x3)") {
      IndexMaintenance.applyGatedUpserts(spark, idx, sig, dels(12), ver = 4L,
        buckets = 8, docFold = Some((log, fold)))
    }
    // the same waves through a fold-free universe: the gated-batch floor
    val idx2 = "pgc2_idx"; val sig2 = "pgc2_sigs"
    IndexMaintenance.initStores(spark, idx2)
    IngestDedup.initStore(spark, sig2)
    graft.sources.Sinks.dropTable(spark, sig2 + "_pending_rm")
    time("wave1 bootstrap (gated, NO fold)") {
      IndexMaintenance.applyGatedUpserts(spark, idx2, sig2, corpus, ver = 1L,
        buckets = 8)
    }
    time("wave2 delete-only (NO fold)") {
      IndexMaintenance.applyGatedUpserts(spark, idx2, sig2, dels(4), ver = 2L,
        buckets = 8)
    }
    spark.stop()
  }
}
