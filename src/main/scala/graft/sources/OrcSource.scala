package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** ORC source/sink — the third interchange format next to JSONL and
  * CSV, and the second COLUMNAR one next to parquet: the hand-off
  * format when the other end of the pipeline is Hive/Trino-shaped.
  * Built-in `orc` datasource (vectorized reader, predicate pushdown,
  * partition pruning — the same scan behaviors the parquet plans rely
  * on apply).
  *
  * Discipline differs from the text formats because ORC is
  * self-describing: there is no dialect to pin and no corrupt-record
  * lane (a torn stripe fails the read loudly — the format carries
  * checksums). What CAN silently drift at 100 TB is the SCHEMA of
  * handed-off files, so the read here is checked: the caller states
  * the expected schema and a mismatch (missing/renamed column, widened
  * or narrowed type) throws with the exact diff instead of flowing
  * nulls downstream — the explicit-schema stance of [[JsonlSource]]
  * turned into an assertion, since passing `.schema(...)` to a
  * self-describing format would silently null-fill missing columns
  * rather than fail.
  *
  * Writes pin the two scale levers: zstd compression and ORC bloom
  * filters on the caller's point-lookup keys (`orc.bloom.filter.
  * columns` — stripe-level skipping for selective id probes, the ORC
  * analog of the parquet zone-map story). Losslessness is a CHECKED
  * property: q182 writes `documents` as ORC, reads it back through the
  * checked path, and the driver hash-compares against the parquet
  * original. */
object OrcSource {

  /** Write as zstd ORC with bloom filters on `bloomCols` (default: the
    * id column every point lookup probes). One file per partition. */
  def write(df: DataFrame, path: String,
      bloomCols: Seq[String] = Seq("doc_id")): Unit =
    df.write.mode("overwrite")
      .option("compression", "zstd")
      .option("orc.bloom.filter.columns", bloomCols.mkString(","))
      .orc(path)

  /** Read with a schema ASSERTION: field names, types, and order must
    * match `expected` exactly (nullability is not compared — writers
    * legitimately tighten it). Throws with the full diff on drift. */
  def readChecked(spark: SparkSession, path: String,
      expected: StructType): DataFrame = {
    val df = spark.read.orc(path)
    def shape(s: StructType) =
      s.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    require(shape(df.schema) == shape(expected),
      s"ORC schema drift at $path:\n  found    ${shape(df.schema)}\n" +
        s"  expected ${shape(expected)}")
    df
  }

  /** The documents table through the checked read. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    readChecked(spark, path, JsonlSource.documentsSchema)
}
