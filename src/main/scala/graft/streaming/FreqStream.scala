package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-frequency maintenance at INGEST time — the streaming face of
  * the corpus histogram behind q48/q115/q126/q128. A training-data
  * pipeline tracks token (or domain / language / n-gram) frequencies
  * continuously — for tokenizer refresh triggers, Zipf-health
  * monitoring, heavy-hitter boilerplate alarms — and recounting the
  * corpus per batch is exactly the rescan the standing stores exist to
  * avoid.
  *
  * Design: a LOG-STRUCTURED counter store. Each micro-batch appends its
  * own (token, cnt) aggregate — batch-bounded work, one map-side
  * combined agg over the batch, an append of at most
  * |batch vocabulary| rows, and NOTHING corpus-sized. Serving
  * re-aggregates the delta log (sum of deltas = exact count — counts
  * are mergeable, the same property CMS exploits approximately);
  * [[compact]] periodically folds the log back to one row per token so
  * the log length is bounded by vocabulary size, not stream length.
  * The store is BUCKETED by token, so both the serving aggregation and
  * the compaction groupBy plan WITHOUT an exchange (the shuffle was
  * paid at append time), and appends preserve the bucket spec.
  *
  * Exactness is the pinned semantics: served counts equal a batch
  * recount of everything appended, independent of how the stream was
  * batched (sum is associative/commutative over any batch split) —
  * which is what lets q133 run the replay through the driver's DuckDB
  * hash gate against the same oracle shape as q128's exact path.
  */
object FreqStream {

  private def countsTable(name: String) = s"${name}_counts"

  /** Drop the standing counter store, location-safely. */
  def initStore(spark: SparkSession, name: String): Unit =
    graft.sources.Sinks.dropTable(spark, countsTable(name))

  /** Fold one micro-batch of documents into the store: aggregate the
    * batch's tokens (batch-bounded, map-side combined) and append the
    * per-token deltas. No read of the store, no corpus-sized work —
    * per-batch cost follows the batch. */
  def appendBatch(batch: DataFrame, name: String,
      textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val deltas = batch
      .select(explode(graft.operators.TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    if (!spark.catalog.tableExists(countsTable(name)))
      initStore(spark, name) // clear any stale location from a prior JVM
    deltas.write.mode("append").format("parquet")
      .bucketBy(8, "token").sortBy("token")
      .saveAsTable(countsTable(name))
  }

  /** Exact current counts from the delta log: one token-keyed sum.
    * On the bucketed store this aggregation plans with NO exchange —
    * the shuffle was paid once per append. */
  def counts(spark: SparkSession, name: String): DataFrame =
    spark.table(countsTable(name))
      .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))

  /** Exact top-k heavy hitters from the store (heap-pruned
    * TakeOrderedAndProject over the folded counts; total-order
    * tiebreak on the token). */
  def topK(spark: SparkSession, name: String, k: Int): DataFrame =
    counts(spark, name).orderBy(col("cnt").desc, col("token")).limit(k)

  /** Fold the delta log back to one row per token — the compaction
    * actuator that bounds log length at vocabulary size (the Bm25
    * compactIndex / forest compactStore discipline: localCheckpoint
    * settles the folded counts, then a location-safe bucketed rewrite
    * with the SAME spec so serving keeps its exchange-free plan).
    * Served counts before and after are identical (sum of one delta
    * per token = the delta). */
  def compact(spark: SparkSession, name: String): Unit = {
    if (!spark.catalog.tableExists(countsTable(name))) return
    val folded = counts(spark, name).localCheckpoint()
    graft.sources.Sinks.parquetBucketed(
      folded, countsTable(name), 8, Seq("token"), Seq("token"))
  }

  /** Batch-mode replay: feed `docs` through [[appendBatch]] in
    * `nBatches` contiguous id ranges — the SAME code the streaming
    * wiring runs per micro-batch; q133 drives it so the driver's
    * oracle gate covers the incremental-count path. */
  def replayInBatches(docs: DataFrame, name: String, nBatches: Int,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    initStore(spark, name)
    val maxId = docs.agg(max(col(idCol))).head().getLong(0)
    val step = (maxId + nBatches) / nBatches // ceil((max+1)/n)
    (0 until nBatches).foreach { k =>
      appendBatch(
        docs.filter(col(idCol) >= k * step && col(idCol) < (k + 1) * step),
        name, textCol)
    }
  }

  /** Incremental DRIFT monitoring from the standing store — the
    * composition the counter store exists for: as each batch folds in,
    * score KL(batch ‖ corpus-so-far) with the batch as the slice and
    * the store AFTER the fold as the reference (batch support ⊆
    * reference support by construction, so the plug-in estimate needs
    * no smoothing — the [[graft.operators.Drift]] convention). A
    * drifting source shows up as a KL step in this sequence without
    * ever rescanning history: per-batch cost is the batch histogram
    * plus one token-keyed join against the store (exchange-free on the
    * bucketed side). Batch 0 scores exactly 0 (it IS the corpus).
    *
    * Returns one row per batch: (batch, n_tokens, vocab, kl) with the
    * Drift separable-KL formula, kl rounded to `scale` (sum aggregate;
    * raw double sums are shuffle-order nondeterministic). */
  def replayWithDrift(docs: DataFrame, name: String, nBatches: Int,
      idCol: String = "doc_id", textCol: String = "text",
      scale: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    initStore(spark, name)
    val maxId = docs.agg(max(col(idCol))).head().getLong(0)
    val step = (maxId + nBatches) / nBatches
    (0 until nBatches).map { k =>
      val batch = docs.filter(col(idCol) >= k * step && col(idCol) < (k + 1) * step)
      appendBatch(batch, name, textCol)
      val cbt = batch
        .select(explode(graft.operators.TextAnalysis.tokens(col(textCol))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("c_bt"))
      val ref = counts(spark, name).withColumnRenamed("cnt", "c_t")
      val total = ref.agg(sum(col("c_t")).as("n_total"))
      cbt.join(ref, "token")
        .crossJoin(broadcast(total))
        .agg(
          sum(col("c_bt")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(col("c_bt").cast("double") *
            log(col("c_bt").cast("double") / col("c_t").cast("double"))).as("__num"),
          first(col("n_total")).as("__n"))
        .select(lit(k.toLong).as("batch"), col("n_tokens"), col("vocab"),
          round(col("__num") / col("n_tokens").cast("double") +
            log(col("__n").cast("double") / col("n_tokens").cast("double")),
            scale).as("kl"))
        // settle NOW: a lazy plan would re-read the store after later
        // batches appended and score every batch against the FINAL
        // corpus (the admitBatch lesson, IngestDedup.scala)
        .localCheckpoint()
    }.reduce(_.unionByName(_))
  }

  /** Streaming wiring: foreachBatch over a document stream, folding
    * each micro-batch into the standing counter store. */
  def ingestStream(docs: DataFrame, name: String, textCol: String = "text")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, name, textCol)
      }
}
