package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source/sink with the same ingestion discipline as
  * [[JsonlSource]] — the OTHER interchange format corpora and metadata
  * tables arrive in (label sheets, crawl manifests, vendor exports):
  *
  *   - explicit schema, never inference (inference is an extra full
  *     scan at 100 TB and a skewed sample silently narrows types);
  *   - PERMISSIVE corrupt-record capture — a ragged or torn row lands
  *     in `_corrupt_record` for quarantine instead of killing the
  *     stage;
  *   - losslessness as a CHECKED property: q170 writes the documents
  *     table as real quoted CSV and reads it back through this path,
  *     and the driver hash-compares the roundtrip against the parquet
  *     original — any quoting/escaping/empty-vs-null loss in either
  *     direction breaks the gate.
  *
  * The write pins the dialect explicitly (header, full quoting with
  * doubled-quote escapes, explicit null token): CSV's failure mode is
  * DIALECT AMBIGUITY, and at scale the reader is often not Spark —
  * fixing the dialect in one place is what makes the files portable.
  * `emptyValue` is set apart from `nullValue` so `""` survives as the
  * empty string rather than collapsing into null on the way back.
  * CSV with quoted newlines would NOT be splittable; corpus text here
  * is single-line by fixture contract, and multiline content belongs
  * in JSONL/parquet (documented boundary, enforced by `multiLine`
  * staying false on the read).
  */
object CsvSource {

  /** The documents-table schema, spelled explicitly. */
  val documentsSchema: StructType = JsonlSource.documentsSchema

  private val dialect = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"", // RFC-4180 doubled quotes, not backslash
    "quoteAll" -> "true",
    "nullValue" -> "\\N",
    "emptyValue" -> "")

  /** Write any frame as headered, fully-quoted CSV (one file per
    * partition). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").options(dialect).csv(path)

  /** Read CSV documents with the explicit schema + corrupt-record
    * capture (PERMISSIVE: malformed rows carry the raw line in
    * `_corrupt_record`, null data fields). */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema.add("_corrupt_record", StringType))
      .options(dialect)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Clean rows only (the serving view); pair with [[corruptCount]]
    * to quarantine loudly instead of silently. */
  def readDocumentsClean(spark: SparkSession, path: String): DataFrame =
    readDocuments(spark, path)
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")

  /** Number of malformed rows — the ingest-health alert metric. Same
    * text-scan-then-parse shape as [[JsonlSource.corruptRecords]]
    * (SPARK-21610 applies to the CSV reader too), with `from_csv`
    * doing the judging; the header line is excluded by matching the
    * schema's own header rendering. */
  def corruptCount(spark: SparkSession, path: String): Long = {
    val withCorrupt = documentsSchema.add("_corrupt_record", StringType)
    val opts = dialect ++ Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt_record", "header" -> "false")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      // drop per-file header lines (quoteAll renders them quoted)
      .filter(col("value") =!=
        documentsSchema.fieldNames.map("\"" + _ + "\"").mkString(","))
      .select(from_csv(col("value"), withCorrupt, opts).as("parsed"))
      .filter(col("parsed._corrupt_record").isNotNull)
      .count()
  }
}
