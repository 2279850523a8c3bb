package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque BINARY + typed metadata.
  *
  * The Spark-side shape is the real deliverable here — schema, batch
  * iteration, partition-parallel decode — while the codec itself is a
  * clearly-marked deterministic stub (image/audio libraries are not in
  * this container). Swapping `stubDecode` for a real JNI/ffmpeg/JPEG
  * decoder changes nothing about the plan: decode stays a narrow
  * per-partition map with no shuffle, exactly how a 100 TB media table
  * wants to be processed (data-local, no driver involvement, columnar
  * in/out).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true))), nullable = false)))

  /** Wrap any (id, text-ish) table into a media table: payload = UTF-8
    * bytes standing in for an encoded image/audio blob. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("stub/utf8").as("format"),
        length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** STUB decode — stands in for image decode / audio feature
    * extraction. Deterministic: 8-dim "feature vector" derived from
    * byte statistics, plus width/height pretending to be image dims.
    * Replace the body with a real codec; the signature and the
    * partition-parallel execution shape are production-real.
    *
    * Lane j accumulates an exact integer sum of every 8th byte, with
    * ONE float rounding at the end ((sum/255)/divisor in f64, then
    * toFloat) — not an incremental f32 fold — so the result is
    * arithmetic any engine can reproduce bit-exactly, which is what
    * lets q60 carry a full DuckDB oracle.
    */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0, 0, new Array[Float](8))
    else {
      val sums = new Array[Long](8)
      var i = 0
      while (i < payload.length) {
        sums(i % 8) += (payload(i) & 0xff)
        i += 1
      }
      val divisor = math.max(1, payload.length / 8 + 1).toDouble
      val feats = new Array[Float](8)
      var j = 0
      while (j < 8) { feats(j) = ((sums(j) / 255.0) / divisor).toFloat; j += 1 }
      (payload.length % 640, payload.length % 480, feats)
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Partition-parallel decode + feature extraction: the distributed
    * analog of `mapInPandas` batches — one iterator pass per partition,
    * no shuffle, no driver data movement. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    graft.GraftSession.widen(media.select(col("media_id"), col("payload"))).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = stubDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), w, h, f)
      }
    }(enc)
  }

  /** STUB resize — stands in for image resizing. Deterministic byte
    * downsample by `factor` (keep every factor-th byte); the real
    * implementation swaps in a codec, the partition-parallel no-shuffle
    * shape stays. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0)
    val f = udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val out = new Array[Byte]((payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = payload(i * factor); i += 1 }
        out
      }
    }
    media.withColumn("payload", f(col("payload")))
      .withColumn("meta", struct(
        col("meta.format"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        col("meta.source")))
  }

  /** Frame-sample shape for video-ish payloads: split the payload into
    * fixed-size "frames", keep every `stride`-th — demonstrates the
    * explode-with-metadata pattern (one row per sampled frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(nFrames, lit(1)) - 1), i => i % stride === 0)))
      .select(
        col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }
}
