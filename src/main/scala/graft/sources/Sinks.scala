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

  /** Single-header CSV export (driver-friendly small results). */
  def csv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Line-delimited JSON export. */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
