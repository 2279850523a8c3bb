package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STANDING HEAVY-HITTERS SKETCHES — per-group Misra-Gries summaries
  * (Misra & Gries 1982; the merge is the mergeable-summaries form of
  * Agarwal et al. 2012: add counters pointwise, subtract the
  * (k+1)-th largest, keep positives) maintained across ingest waves
  * under the CountStore lifecycle (`__building` marker, `_applied`
  * ledger, fail-loud serve guard — the NbStore/SketchStore
  * discipline).
  *
  * Why this is the 100 TB shape for "top n-grams per domain" (the
  * q139 decontamination path's feed): exact per-group item counts
  * need state proportional to the DISTINCT ITEMS — corpus-scale for
  * n-grams; the MG summary keeps at most k counters per group —
  * state proportional to GROUPS — and maintenance is one
  * batch-counts + store union, re-sum, compress pass per wave, never
  * a corpus re-scan. Guarantees (deterministic, not probabilistic):
  * every stored estimate UNDERCOUNTS (est ≤ true), the undercount is
  * bounded by n_grp/(k+1) (n_grp = the group's total item count,
  * tracked exactly in `<name>_hh_n`), and therefore every item whose
  * true count exceeds n_grp/(k+1) is guaranteed present — no false
  * dropouts among the true heavies. When a group's distinct items
  * never exceed k, compression never fires and the summary IS the
  * exact count table (the q247 exact leg rides this).
  *
  * All arithmetic is integer and deterministic — the q246 gate pins
  * the guarantees as in-engine bits against an exact fixture-scale
  * recompute, and q247 hash-matches the uncompressed serve against a
  * full DuckDB oracle.
  *
  * Store layout: `<name>_hh` (grp string, item string, cnt long —
  * ≤ k rows per group), `<name>_hh_n` (grp, n — exact, additive),
  * `<name>_hh_params` (k). TAKEDOWN LIMITATION (stated, the
  * SketchStore clause): MG counters are not invertible — takedown
  * semantics = [[initStore]] over the retained corpus. */
object HhStore {

  def initStore(items: DataFrame, name: String, grpCol: String,
      itemCol: String, k: Int): Unit = {
    require(k > 0, s"k must be positive, got $k")
    val spark = items.sparkSession
    CountStore.setBuilding(spark, name, on = true)
    CountStore.dropLedger(spark, name)
    val c = counts(items, grpCol, itemCol).localCheckpoint()
    graft.sources.Sinks.parquetTable(compress(c, k), s"${name}_hh")
    graft.sources.Sinks.parquetTable(
      c.groupBy(col("grp")).agg(sum(col("cnt")).as("n")), s"${name}_hh_n")
    graft.sources.Sinks.parquetTable(
      spark.range(1).select(lit(k).as("k")), s"${name}_hh_params")
    CountStore.setBuilding(spark, name, on = false)
  }

  /** One wave: exact-count the batch per (grp, item), add into the
    * stored counters, re-compress to k per group; the group totals
    * fold additively (exact). Returns false on a re-delivered batch
    * id. */
  def applyBatch(batch: DataFrame, name: String, grpCol: String,
      itemCol: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    CountStore.requireServable(spark, name)
    if (CountStore.alreadyApplied(spark, name, batchId)) false
    else {
      val (merged, n) = mergedWith(batch, name, grpCol, itemCol)
      CountStore.applyOnce(spark, name, batchId) {
        graft.sources.Sinks.parquetTable(merged, s"${name}_hh")
        graft.sources.Sinks.parquetTable(n, s"${name}_hh_n")
      }
    }
  }

  /** Ledger-FREE merge — the admission fold's put-side op (the fold
    * carries its own batch ledger). */
  def mergeDocs(batch: DataFrame, name: String, grpCol: String,
      itemCol: String): Unit = {
    val spark = batch.sparkSession
    CountStore.requireServable(spark, name)
    val (merged, n) = mergedWith(batch, name, grpCol, itemCol)
    graft.sources.Sinks.parquetTable(merged, s"${name}_hh")
    graft.sources.Sinks.parquetTable(n, s"${name}_hh_n")
  }

  private def mergedWith(batch: DataFrame, name: String, grpCol: String,
      itemCol: String): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val k = kOf(spark, name)
    val bc = counts(batch, grpCol, itemCol).localCheckpoint()
    val merged = compress(
      spark.table(s"${name}_hh").unionByName(bc)
        .groupBy(col("grp"), col("item"))
        .agg(sum(col("cnt")).as("cnt")), k)
      .localCheckpoint() // settle BEFORE overwriting what we read
    val n = spark.table(s"${name}_hh_n")
      .unionByName(bc.groupBy(col("grp")).agg(sum(col("cnt")).as("n")))
      .groupBy(col("grp")).agg(sum(col("n")).as("n"))
      .localCheckpoint()
    (merged, n)
  }

  def maintainStream(items: DataFrame, name: String, grpCol: String,
      itemCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    items.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          applyBatch(batch, name, grpCol, itemCol, batchId); ()
        }
      }

  /** Serve the top `n` heavies per group with the per-item error
    * envelope: est ≤ true ≤ est + floor(n_grp/(k+1)). Store-sized. */
  def topHitters(spark: SparkSession, name: String, n: Int): DataFrame = {
    CountStore.requireServable(spark, name)
    val k = kOf(spark, name)
    graft.plans.TopKPerKey.rankedTopKMulti(
        spark.table(s"${name}_hh").withColumn("__neg", -col("cnt")),
        Seq("grp"), Seq("__neg", "item"), n)
      .drop("__neg")
      .join(spark.table(s"${name}_hh_n"), Seq("grp"))
      .select(col("grp"), col("rank"), col("item"), col("cnt"),
        (col("cnt") + floor(col("n") / (k + 1)).cast("long")).as("cnt_hi"))
  }

  /** Operational introspection (the describeStore discipline). */
  def describeStore(spark: SparkSession, name: String): DataFrame =
    CountStore.describe(spark, name, Map(
      "n_counters" -> (s"${name}_hh", count(lit(1))),
      "n_groups" -> (s"${name}_hh_n", count(lit(1))),
      "n_items_total" -> (s"${name}_hh_n", coalesce(sum(col("n")), lit(0L))),
      "k" -> (s"${name}_hh_params", sum(col("k")))))

  private def kOf(spark: SparkSession, name: String): Int =
    spark.table(s"${name}_hh_params").head().getAs[Int]("k")

  private def counts(df: DataFrame, grpCol: String, itemCol: String): DataFrame =
    df.select(col(grpCol).cast("string").as("grp"),
        col(itemCol).cast("string").as("item"))
      .groupBy(col("grp"), col("item"))
      .agg(count(lit(1)).as("cnt"))

  /** The MG compress: subtract each group's (k+1)-th largest counter
    * from every counter, keep positives — at most k survive. The
    * (k+1)-rank runs through the heap-pruned TopKPerKey operator
    * (O(items log k), only k+1 rows per group survive the shuffle —
    * never a full per-group sort), then one groups-sized join back;
    * ties break on item so the state is deterministic (and therefore
    * oracle-able). */
  private[operators] def compress(c: DataFrame, k: Int): DataFrame = {
    val ranked = graft.plans.TopKPerKey.rankedTopKMulti(
        c.withColumn("__neg", -col("cnt")), Seq("grp"),
        Seq("__neg", "item"), k + 1)
      .drop("__neg")
    val offsets = ranked.filter(col("rank") === k + 1)
      .select(col("grp"), col("cnt").as("__off"))
    ranked.filter(col("rank") <= k)
      .join(offsets, Seq("grp"), "left")
      .select(col("grp"), col("item"),
        (col("cnt") - coalesce(col("__off"), lit(0L))).as("cnt"))
      .filter(col("cnt") > 0)
  }
}
