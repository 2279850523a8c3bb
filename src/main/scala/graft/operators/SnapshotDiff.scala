package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-ingestion primitive: given
  * two versions of a keyed table, classify every key as
  * added / removed / changed / unchanged. Pipelines run this between
  * crawl drops to (a) bound reprocessing to `added ∪ changed` (the
  * delta that must re-enter dedup/quality/indexing) and (b) propagate
  * `removed` into the standing stores' delete paths
  * (`DistributedAnnForest.remove`, `Bm25.deleteDocs`,
  * `IngestDedup.removeFromStore`).
  *
  * Scale shape: ONE full-outer equi-join on the id — co-partitioned
  * and exchange-free when both snapshots are bucketed tables (the
  * Sinks bucketing layout), a single id-keyed shuffle otherwise. The
  * content comparison is a null-safe struct equality on the projected
  * `contentCols` — narrow, codegen'd, no hashing round-trip — so the
  * status column is exactly reproducible by any SQL engine (an
  * xxhash64 precompare adds nothing ON TOP of the join: the rows are
  * already co-located, and `<=>` short-circuits on length/first-diff).
  * Where a hash DOES pay is persisting it per snapshot so the next
  * diff reads (id, hash) instead of full content — that standing
  * shape is `Sinks`' business, not this operator's.
  */
object SnapshotDiff {

  /** Per-key status between `oldDf` and `newDf`:
    * (idCol, status ∈ added|removed|changed|unchanged). Keys absent
    * from both sides (by construction) don't appear. Null contents are
    * compared null-safely: (null, null) is unchanged, (null, x) is
    * changed. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must name at least one column")
    val o = oldDf.select(col(idCol),
      struct(contentCols.map(col): _*).as("__old"), lit(1).as("__in_old"))
    val n = newDf.select(col(idCol),
      struct(contentCols.map(col): _*).as("__new"), lit(1).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__old") <=> col("__new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The diff rolled up per status (and optionally per slice column) —
    * the drop-over-drop monitoring view: a sudden `changed` spike
    * flags an upstream re-crawl, a `removed` spike a takedown batch. */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, contentCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
