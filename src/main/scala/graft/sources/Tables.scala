package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture table loaders (driver-generated parquet at /root/testdata/sf*). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    // reader rejects; read nanos as LONG and convert (µs truncation —
    // the fixture's values are µs-precision, so lossless).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}

/** Reader for the fastText `.vec` text format the reference consumes
  * (reference: src/main.rs:11-40 — skip header line, split on whitespace,
  * token 0 = word, tokens 1..N = f32 components; sequential row ids).
  *
  * Spark-first shape: `spark.read.text` scan → split/slice/transform
  * projection — all Catalyst built-ins, so the parse itself is codegen'd
  * and scales linearly with input splits. The sequential-id assignment
  * uses a window over file order at fixture scale; at 100 TB ids would
  * come from `monotonically_increasing_id` (stable but sparse) since a
  * global dense sequence is inherently serial.
  */
object VecReader {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("word", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** Read a .vec file; `dim` validated per-row (malformed rows are
    * rejected up front rather than the reference's parse-panic,
    * src/main.rs:33-37). Sequential ids come from `zipWithIndex` —
    * per-partition counting plus one count-aggregation pass, no
    * single-partition global window (text splits keep file order, so
    * ids are load-order stable like the reference's). */
  def read(spark: SparkSession, path: String, dim: Int): DataFrame = {
    import spark.implicits._
    val indexed = spark.read.textFile(path).rdd
      .zipWithIndex()
      .map { case (line, pos) => (pos, line) }
      .toDF("pos", "value")
    indexed
      .filter(col("pos") >= 1) // skip header line (src/main.rs:21-22)
      .withColumn("tok", split(trim(col("value")), "\\s+"))
      .filter(size(col("tok")) === dim + 1)
      .select(
        (col("pos") - 1).cast(LongType).as("id"),
        col("tok").getItem(0).as("word"),
        transform(slice(col("tok"), 2, dim), _.cast(FloatType)).as("embedding"))
  }
}
