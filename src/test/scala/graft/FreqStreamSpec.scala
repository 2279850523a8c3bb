package graft

import org.apache.spark.sql.functions._
import graft.streaming.FreqStream

class FreqStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b a c"),
    (1L, "b b d"),
    (2L, "a d d d"),
    (3L, "e"),
    (4L, "a e b")).toDF("doc_id", "text")

  private def asMap(name: String) =
    FreqStream.counts(spark, name).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private val truth = Map("a" -> 4L, "b" -> 4L, "c" -> 1L, "d" -> 4L, "e" -> 2L)

  test("sum-of-deltas counts are exact and batching-independent") {
    FreqStream.replayInBatches(docs, "graft_freq_b1", nBatches = 1)
    FreqStream.replayInBatches(docs, "graft_freq_b4", nBatches = 4)
    assert(asMap("graft_freq_b1") === truth)
    assert(asMap("graft_freq_b4") === truth)
  }

  test("compact folds the log to one row per token without changing served counts") {
    FreqStream.replayInBatches(docs, "graft_freq_c", nBatches = 5)
    val logRows = spark.table("graft_freq_c_counts").count()
    assert(logRows > truth.size, "multi-batch log must carry per-batch deltas")
    FreqStream.compact(spark, "graft_freq_c")
    assert(spark.table("graft_freq_c_counts").count() === truth.size.toLong)
    assert(asMap("graft_freq_c") === truth)
    // compaction is idempotent
    FreqStream.compact(spark, "graft_freq_c")
    assert(asMap("graft_freq_c") === truth)
  }

  test("serving aggregation plans with no exchange over the bucketed store") {
    FreqStream.replayInBatches(docs, "graft_freq_p", nBatches = 2)
    val p = FreqStream.counts(spark, "graft_freq_p")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucketed-store counts must not shuffle:\n$p")
  }

  test("foreachBatch stream folds the same counts as the batch replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_freq_stream").toString
    def write(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").repartition(1).write.mode("append").parquet(dir)
    val all = docs.as[(Long, String)].collect().toSeq
    write(all.slice(0, 2))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    FreqStream.initStore(spark, "graft_freq_s")
    val q = FreqStream.ingestStream(stream, "graft_freq_s").start()
    q.processAllAvailable()
    write(all.slice(2, 5))
    q.processAllAvailable()
    q.stop()
    assert(asMap("graft_freq_s") === truth)
  }
}
