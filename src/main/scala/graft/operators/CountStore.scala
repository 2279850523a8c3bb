package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Signed merge into a standing COUNT table — the shared lifecycle
  * core of every count-shaped model asset (the NB classifier's
  * (label, token) counts, the trigram LM's n-gram tables): counts are
  * additive, so append is +delta, remove is −delta, and the
  * maintained table is ALGEBRAICALLY equal to a fresh count of the
  * live corpus — no tombstones, no rebuild, no approximation. The
  * q218/q219 gates pin that equality bit-for-bit.
  *
  * Fail-loud: a negative post-merge count means a removal was never
  * (fully) appended — silent model corruption. The merge asserts
  * non-negativity across ALL count columns (one model-sized action)
  * BEFORE anything is written, then drops all-zero rows, so the store
  * always equals SOME corpus's fresh count.
  *
  * Scale shape: one union + one re-aggregate + one rewrite, all of
  * MODEL size (vocab-bounded, ≪ corpus); the rewrite preserves the
  * table's bucketed layout so serving joins keep bucket-pruning. */
object CountStore {

  /** Validate-then-write is SPLIT so a multi-table store (NB: counts +
    * class; LM: tri + bi + uni) can validate EVERY table's merge
    * before writing ANY of them — a delta that passes one table's
    * non-negativity but fails another's must leave the whole store
    * untouched, not half-written. [[prepareSigned]] settles and
    * validates; [[write]] commits. */
  def prepareSigned(table: String, delta: DataFrame, keyCols: Seq[String],
      cntCols: Seq[String], sign: Long): DataFrame = {
    val spark = delta.sparkSession
    val signed = delta.select(
      keyCols.map(col) ++ cntCols.map(c => (col(c) * sign).as(c)): _*)
    val merged = spark.table(table)
      .unionByName(signed)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(cntCols.head)).as(cntCols.head),
        cntCols.tail.map(c => sum(col(c)).as(c)): _*)
      .localCheckpoint() // settle BEFORE overwriting what we read
    val neg = merged.filter(
      cntCols.map(c => col(c) < 0).reduce(_ || _)).count()
    require(neg == 0,
      s"$table: $neg rows went negative — the removal was never " +
        "(fully) appended; store unchanged, nothing written")
    merged.filter(cntCols.map(c => col(c) =!= 0).reduce(_ || _))
  }

  /** Commit a prepared frame. Buckets > 0 rewrites bucketed by
    * `bucketCols`; 0 writes plain. */
  def write(table: String, live: DataFrame, buckets: Int,
      bucketCols: Seq[String]): Unit =
    if (buckets > 0)
      graft.sources.Sinks.parquetBucketed(live, table, buckets,
        bucketCols, bucketCols)
    else graft.sources.Sinks.parquetTable(live, table)

  /** Single-table convenience: prepare + write. */
  def mergeSigned(table: String, delta: DataFrame, keyCols: Seq[String],
      cntCols: Seq[String], sign: Long, buckets: Int,
      bucketCols: Seq[String]): Unit =
    write(table, prepareSigned(table, delta, keyCols, cntCols, sign),
      buckets, bucketCols)
}
