package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * scraped text corpora actually arrive in. Spark's `read.json` /
  * `write.json` already speak line-delimited JSON; what a pipeline
  * layer adds is the INGESTION DISCIPLINE:
  *
  *   - explicit schema, never inference (an inference pass is a full
  *     extra scan at 100 TB, and a skewed sample silently narrows
  *     types);
  *   - PERMISSIVE corrupt-record capture: a malformed line lands in
  *     `_corrupt_record` instead of killing the stage — at web scale
  *     there is ALWAYS a truncated line — and the caller counts and
  *     quarantines rather than crashes;
  *   - losslessness as a checked property: q136 writes the documents
  *     table out as real JSONL files and reads them back through this
  *     path, and the driver hash-compares the roundtrip against the
  *     parquet original — any escaping/unicode/number-width loss in
  *     either direction breaks the gate.
  *
  * Scan shape: JSONL is splittable by line, so the read parallelizes
  * like any text source; schema projection prunes parsing to the
  * requested fields (Jackson skips unrequested subtrees).
  */
object JsonlSource {

  /** The documents-table schema, spelled explicitly (see scaladoc). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Write any frame as JSONL (one object per line, one file per
    * partition — the layout scraped corpora ship in). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL documents with the explicit schema + corrupt-record
    * capture. Well-formed rows carry null `_corrupt_record`; malformed
    * lines carry the raw line there and null data fields. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Clean rows only (the serving view): corrupt lines dropped, the
    * capture column removed. Pair with [[corruptCount]] to quarantine
    * loudly instead of silently. */
  def readDocumentsClean(spark: SparkSession, path: String): DataFrame =
    readDocuments(spark, path)
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")

  /** The quarantine view: (raw_line, parsed struct) for every
    * MALFORMED non-blank line. Built from a `text` scan + `from_json`
    * rather than the native JSON reader: Spark disallows raw-JSON-scan
    * queries that reference only the internal corrupt column
    * (SPARK-21610 — column pruning would leave the parser nothing to
    * judge corruptness from), and both "count the corrupt lines" and
    * "count the clean lines" prune to exactly that shape. Parsing
    * explicitly over a text column has no such restriction, costs the
    * same single splittable scan, and keeps the raw line for the
    * quarantine sink. */
  def corruptRecords(spark: SparkSession, path: String): DataFrame = {
    val withCorrupt = documentsSchema.add("_corrupt_record", StringType)
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw_line"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("parsed"))
      .filter(col("parsed._corrupt_record").isNotNull)
  }

  /** Number of malformed lines — the ingest-health metric a pipeline
    * alerts on (see [[corruptRecords]] for why this is a text-scan
    * parse, not a raw-JSON-reader filter). */
  def corruptCount(spark: SparkSession, path: String): Long =
    corruptRecords(spark, path).count()
}
