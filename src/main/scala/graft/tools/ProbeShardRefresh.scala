package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** One-shot probe backing the round-9 incremental shard refresh: as
  * the delivered corpus grows 10×, a FIXED-size delta refresh must
  * read and write O(touched shards), not O(corpus). Measures, per
  * growth step, the records READ by the refresh (partition-pruned
  * prior-layout scan + the delta) and the records WRITTEN (the merged
  * touched shards), against the corpus size and a full-rewrite
  * baseline's write volume. Expectation: refresh reads/writes track
  * |touched shards| × shard size (which grows only because the corpus
  * grows into the same 64 shards here), and stay a small fraction of
  * the full rewrite, with wall time following. */
object ProbeShardRefresh {

  private final class IoRecords extends SparkListener {
    val read = new AtomicLong(0L)
    val written = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        written.addAndGet(t.taskMetrics.outputMetrics.recordsWritten)
      }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    import graft.sources.Sinks
    val path = "/tmp/graft_probe_shards"
    val nShards = 64
    val perWave = 100000L
    def docs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("doc_id"),
        concat(lit("text of doc "), col("id")).as("text"),
        (pmod(col("id"), lit(97)) + 10).as("n_chars"))
    // the fixed delta is TAKEDOWN-sized (3 edits + 2 deletes): hash
    // sharding scatters ids uniformly, so a delta of k ids touches
    // min(k, nShards) shards — the pruning win exists exactly when
    // k ≪ nShards (at 100 TB nShards is 10⁴-10⁵ and this holds for
    // real edit/takedown waves; a corpus-sized delta is a rewrite and
    // should be one)
    val upserts = docs(0L, 3L).withColumn("text", concat(col("text"), lit(" v2")))
    val deletes = spark.range(10L, 12L).select(col("id").as("doc_id"))

    var delivered = 0L
    for (k <- 0 until 10) {
      // grow the corpus by one wave: full (re)delivery of everything so
      // far — the baseline a delta refresh is supposed to beat
      delivered = (k + 1) * perWave
      val t0 = System.nanoTime()
      Sinks.sharded(docs(0L, delivered), path, nShards, "doc_id")
      val fullSecs = (System.nanoTime() - t0) / 1e9

      val l = new IoRecords
      spark.sparkContext.addSparkListener(l)
      val t1 = System.nanoTime()
      Sinks.shardedRefresh(spark, path, upserts, deletes, nShards, "doc_id")
      val refreshSecs = (System.nanoTime() - t1) / 1e9
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(l)
      val touched = upserts.select(Sinks.hashShard(col("doc_id"), nShards))
        .union(deletes.select(Sinks.hashShard(col("doc_id"), nShards)))
        .distinct().count()
      println(f"WAVE=${k + 1} corpus=$delivered touchedShards=$touched/" +
        f"$nShards fullRewriteSecs=$fullSecs%.2f refreshSecs=$refreshSecs%.2f " +
        f"refreshRecordsRead=${l.read.get} refreshRecordsWritten=${l.written.get}")
    }
    spark.stop()
  }
}
