package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.asMediaTable(
    Tables.documents(spark, sf0001), "doc_id", "text", "source").cache()

  test("media table has the binary+metadata schema") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val meta = media.select($"meta.format", $"meta.n_bytes", $"meta.source").head()
    assert(meta.getString(0) === "stub/utf8")
    assert(meta.getLong(1) > 0)
  }

  test("decodeFeatures yields fixed-shape feature vectors, one row per media") {
    val dec = Multimodal.decodeFeatures(media)
    assert(dec.count() === media.count())
    val sizes = dec.select(size($"features")).distinct().as[Int].collect()
    assert(sizes.toSeq === Seq(8))
  }

  test("decode is deterministic") {
    val a = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    val b = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("resize downsamples payload bytes by the factor and updates metadata") {
    val small = Multimodal.resize(media, factor = 4)
    val r = media.select(length($"payload").as("orig"))
      .crossJoin(small.limit(1).select(length($"payload").as("small"), $"meta.n_bytes"))
      .limit(1).head()
    assert(r.getAs[Long]("n_bytes") === r.getInt(1).toLong)
    val pair = media.orderBy("media_id").limit(1).select(length($"payload")).head().getInt(0)
    val resized = small.orderBy("media_id").limit(1).select(length($"payload")).head().getInt(0)
    assert(resized === (pair + 3) / 4)
  }

  test("frame sampling keeps every stride-th frame with correct byte slices") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val idx = frames.select("frame_idx").distinct().as[Int].collect()
    assert(idx.forall(_ % 2 === 0))
    // no frame exceeds the frame size
    val maxLen = frames.select(max(length($"frame"))).head().getInt(0)
    assert(maxLen <= 64)
  }
}
