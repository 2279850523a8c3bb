package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** One-shot probe backing the round-9 fingerprint-log partitioning
  * (r8 verdict #5): grows the `_fplog` 10× through add waves, then
  * measures the FILE INPUT RECORDS a small-batch change-detection
  * probe reads at each growth step. With the log Hive-partitioned on
  * pmod(xxhash64(id), 64) and the probe filtering to the batch's
  * prefix set, the records read stay bounded by the batch's prefixes
  * (≈ |prefixes|/64 of the log) instead of tracking the log's size. */
object ProbeFplogPrune {

  private final class InputRecords extends SparkListener {
    val records = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        records.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    import graft.streaming.IndexMaintenance
    val name = "graft_pfp"
    IndexMaintenance.initStores(spark, name)
    val perWave = 20000L
    // a tiny fixed probe batch: 5 ids from wave 1, unchanged content
    def text(idc: org.apache.spark.sql.Column) =
      concat(lit("tok"), pmod(idc, lit(997)), lit(" tok"), pmod(idc, lit(131)))
    def wave(k: Int) = spark.range(k * perWave, (k + 1) * perWave)
      .select(col("id").as("doc_id"), text(col("id")).as("text"))
    for (k <- 0 until 10) {
      IndexMaintenance.applyUpserts(spark, name, wave(k), ver = k + 1L,
        buckets = 8)
      val logRows = spark.table(name + "_fplog").count()
      val probeBatch = wave(0).filter(col("doc_id") < 5).localCheckpoint()
      val l = new InputRecords
      spark.sparkContext.addSparkListener(l)
      val d = IndexMaintenance.classifyUpserts(spark, name, probeBatch)
      val statuses = d.groupBy(col("status")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(l)
      println(s"WAVE=${k + 1} logRows=$logRows probeRecordsRead=${l.records.get} " +
        s"statuses=$statuses")
    }
    spark.stop()
  }
}
