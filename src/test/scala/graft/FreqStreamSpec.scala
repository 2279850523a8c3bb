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

  test("incremental drift: batch 0 scores exactly 0; a vocabulary shift shows a KL step") {
    // batches split on doc_id ranges: 0-1 | 2-3 | 4-5; the last batch
    // switches vocabulary entirely
    val shifted = Seq(
      (0L, "a b a c"), (1L, "b b d"),
      (2L, "a d d d"), (3L, "a b c d"),
      (4L, "zz yy zz xx"), (5L, "yy zz xx xx")).toDF("doc_id", "text")
    val out = graft.streaming.FreqStream
      .replayWithDrift(shifted, "graft_freq_drift", nBatches = 3)
      .orderBy($"batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out(0)._3 === 0.0, "first batch IS the corpus — KL must be exactly 0")
    assert(out(1)._3 >= 0.0)
    assert(out(2)._3 > out(1)._3,
      s"vocabulary shift must register as a KL step: ${out.toSeq}")
    // each batch's kl equals a from-scratch recompute against the same
    // cumulative reference (the store adds nothing but incrementality)
    val all = shifted.collect().map(r => (r.getLong(0), r.getString(1)))
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty)
    (0 until 3).foreach { k =>
      val step = 2
      val batchToks = all.filter(d => d._1 >= k * step && d._1 < (k + 1) * step)
        .flatMap(d => toks(d._2))
      val refToks = all.filter(_._1 < (k + 1) * step).flatMap(d => toks(d._2))
      val cb = batchToks.groupBy(identity).view.mapValues(_.length.toLong)
      val ct = refToks.groupBy(identity).view.mapValues(_.length.toLong)
      val nB = batchToks.length.toDouble
      val nT = refToks.length.toDouble
      val kl = cb.map { case (t, c) =>
        c * math.log(c.toDouble / ct(t)) }.sum / nB + math.log(nT / nB)
      val got = out(k)._3
      assert(math.abs(got - BigDecimal(kl).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6, s"batch $k")
    }
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
