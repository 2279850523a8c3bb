package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink helpers. The engine's primary "sink" is the DataFrame return
  * value (composable); these are the materialization patterns for
  * pipeline outputs at scale.
  */
object Sinks {

  /** Partitioned parquet: directory layout = partition pruning for every
    * downstream reader. Sort within partitions for run-length/dictionary
    * friendly pages. */
  def parquetPartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    sorted.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Bucketed + sorted table: the standing-corpus layout. Both sides of
    * a recurring equi-join written with the same bucket count and key
    * hash-align on disk, so every subsequent join (or groupBy on the
    * bucket key) plans WITHOUT an Exchange — the shuffle is paid once at
    * write time, not per query. This is how a 100 TB vector store wants
    * its (tree_id, leaf_id)-routed buckets persisted: the ANN join's
    * corpus-side shuffle disappears from every query batch.
    *
    * Requires saveAsTable (bucket metadata lives in the catalog). */
  def parquetBucketed(
      df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Single-header CSV export (driver-friendly small results). */
  def csv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Line-delimited JSON export. */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
