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

  /** fastText `.vec` export — the reference's input format
    * (header `count dim`, then `word c1 … cN` per line,
    * reference src/main.rs:11-40), written as ONE file at `path` so the
    * reference loader (and [[VecReader.read]]) can consume it directly.
    * Floats are rendered with Float.toString, the shortest decimal that
    * parses back to the identical f32 — the round-trip is bit-exact
    * except for non-canonical NaN payloads (toString collapses them to
    * "NaN"). Rows are emitted in `idCol` order, so ids survive a
    * read-back (VecReader re-derives them from line position).
    *
    * The format is inherently single-file sequential (one global header,
    * position-significant lines) — this is an interop/export utility,
    * not a scale path; at scale, store vectors as parquet. */
  def vec(df: DataFrame, path: String,
      wordCol: String = "word", vecCol: String = "embedding",
      idCol: String = "id"): Unit = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val fmt = udf { (w: String, v: Seq[Float]) =>
      val sb = new StringBuilder(w)
      v.foreach { f => sb.append(' ').append(java.lang.Float.toString(f)) }
      sb.toString
    }
    val hd = df.select(count(lit(1)), first(size(col(vecCol)))).head()
    val n = hd.getLong(0)
    val dim = if (hd.isNullAt(1)) 0 else hd.getInt(1)
    val header = spark.range(1)
      .select(lit(-1L).as("__ord"), lit(s"$n $dim").as("value"))
    val body = df.select(col(idCol).cast("long").as("__ord"),
      fmt(col(wordCol), col(vecCol)).as("value"))
    val tmp = path + ".tmp.dir"
    header.unionByName(body)
      .coalesce(1).sortWithinPartitions(col("__ord"))
      .select(col("value"))
      .write.mode("overwrite").text(tmp)
    // promote the single part file to a plain file at `path`
    val hconf = spark.sparkContext.hadoopConfiguration
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = tmpPath.getFileSystem(hconf)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(tmp + "/part-*"))(0).getPath
    val dest = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(tmpPath, true)
  }
}
