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

  /** A real 8×4 PNG: left half pure red, right half pure white. */
  private def pngFixture(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode through javax.imageio: dims and exact channel means") {
    val png = pngFixture()
    val textBytes = "not an image".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, textBytes)).toDF("media_id", "payload")
    val dec = Multimodal.decodeFeatures(df).orderBy("media_id").collect()
    // row 1: the real decode — true raster dims, hand-computable means
    val r1 = dec(0)
    assert(r1.getInt(1) === 8 && r1.getInt(2) === 4)
    val f = r1.getSeq[Float](3)
    assert(f(0) === 1.0f)                    // meanR: every pixel has r=255
    assert(f(1) === 0.5f && f(2) === 0.5f)   // meanG/meanB: white half only
    // luminance: red=(255*299)/1000=76 (bin 1), white=255 (bin 3)
    assert(f(4) === 0.0f && f(5) === 0.5f && f(6) === 0.0f && f(7) === 0.5f)
    assert(f(3) === ((76L + 255L) * 16 / (255.0 * 32)).toFloat)
    // row 2: non-image payload falls back to the byte-stat stub,
    // bit-identical to calling the stub path directly (q60's oracle)
    val r2 = dec(1)
    assert(r2.getInt(1) === textBytes.length % 640)
    assert(r2.getSeq[Float](3).length === 8)
  }

  test("codec roundtrip: synthetic PNG decodes to the closed-form channel sums; garbage → null") {
    val df = Seq(7L, 12L).toDF("id")
      .withColumn("payload", Multimodal.syntheticPng($"id"))
      .select($"id", Multimodal.imageChannelSums($"payload").as("st"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    for ((id, st) <- df) {
      val (w, h) = (8 + (id % 5).toInt, 8 + (id % 3).toInt)
      assert(st.getInt(0) === w && st.getInt(1) === h)
      def sums(ka: Long, kx: Long, ky: Long) =
        (for (x <- 0 until w; y <- 0 until h)
          yield (id * ka + x * kx + y * ky) % 256).sum
      assert(st.getLong(2) === sums(31, 7, 13), s"sum_r of $id")
      assert(st.getLong(3) === sums(17, 3, 5), s"sum_g of $id")
      assert(st.getLong(4) === sums(23, 11, 2), s"sum_b of $id")
    }
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
      .select(Multimodal.imageChannelSums($"payload").as("st")).head()
    assert(bad.isNullAt(0), "undecodable payload must yield null, not crash")
  }

  test("WAV roundtrip: real javax.sound decode recovers the closed-form PCM16 stats") {
    // local replay of the syntheticWav formula for ids exercising mono
    // (even) and stereo (odd), all three sample rates
    def expect(id: Long) = {
      val channels = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 3).toInt)
      val nFrames = (64 + id % 33).toInt
      val peak = new Array[Long](2); val sAbs = new Array[Long](2); val sSq = new Array[Long](2)
      for (j <- 0 until nFrames * channels) {
        val s = ((id * 31 + j.toLong * 7919) % 65536) - 32768
        val c = j % channels; val a = math.abs(s)
        if (a > peak(c)) peak(c) = a
        sAbs(c) += a; sSq(c) += s * s
      }
      (rate, channels, nFrames.toLong, nFrames.toLong * 1000L / rate,
        peak(0), sAbs(0), sSq(0), peak(1), sAbs(1), sSq(1))
    }
    val rows = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("media_id")
      .withColumn("payload", Multimodal.syntheticWav($"media_id"))
      .select($"media_id", Multimodal.wavStats($"payload").as("st"))
      .select($"media_id", $"st.*")
      .orderBy($"media_id")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val got = (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))
      assert(got === expect(id), s"id=$id")
      if (id % 2 == 0)
        assert(r.getLong(8) === 0L && r.getLong(9) === 0L && r.getLong(10) === 0L,
          "mono carries zeroed channel-1 lanes")
    }
    // non-WAV payloads (and WAV magic over garbage) yield null, never a crash
    val bad = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, "RIFFxxxxWAVEgarbage".getBytes("UTF-8"))).toDF("id", "payload")
      .select(Multimodal.wavStats($"payload").as("st")).collect()
    bad.foreach(r => assert(r.isNullAt(0)))
    // a VALID WAV outside the supported encoding (8-bit PCM) also
    // degrades to null — the documented PCM16-only contract, not a
    // wrong-stats silent path
    val data8 = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data8), fmt8, 64L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val eight = Seq((3L, bos.toByteArray)).toDF("id", "payload")
      .select(Multimodal.wavStats($"payload").as("st")).head()
    assert(eight.isNullAt(0), "8-bit PCM must fall back, not mis-decode")
  }

  test("AIFF/AU containers decode to lanes identical to the WAV of the same clip") {
    // the q161 property locally: three lossless PCM containers of one
    // clip must yield bit-identical integer stats through the single
    // endian-aware audioStats path
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("media_id")
    def lanes(fmt: String) = ids
      .withColumn("payload",
        Multimodal.syntheticAudio($"media_id", lit(fmt)))
      .select($"media_id", Multimodal.audioStats($"payload").as("st"))
      .select($"media_id", $"st.*").orderBy($"media_id").collect().toSeq
    val wav = lanes("wav")
    assert(lanes("aiff") === wav)
    assert(lanes("au") === wav)
    assert(wav.forall(!_.isNullAt(1)), "every container must really decode")
    // magic-sniffed garbage degrades to null for the new containers too
    val bad = Seq(
      (1L, "FORMxxxxAIFFgarbage".getBytes("UTF-8")),
      (2L, ".sndgarbage".getBytes("UTF-8"))).toDF("id", "payload")
      .select(Multimodal.audioStats($"payload").as("st")).collect()
    bad.foreach(r => assert(r.isNullAt(0)))
  }

  test("GIF video roundtrip: multi-frame decode recovers closed-form gray sums and motion") {
    // local replay of the syntheticGif formula — frame count, dims,
    // total gray, inter-frame motion — across frame counts 2..5
    def expect(id: Long) = {
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      val nf = 2 + (id % 4).toInt
      def gray(t: Int, x: Int, y: Int) = (id * 31 + t * 101 + x * 7 + y * 13) % 256
      var sumGray = 0L; var motion = 0L
      for (t <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        sumGray += gray(t, x, y)
        if (t > 0) motion += math.abs(gray(t, x, y) - gray(t - 1, x, y))
      }
      (nf, w, h, sumGray, motion)
    }
    val rows = Seq(0L, 1L, 2L, 3L, 7L, 11L).toDF("media_id")
      .withColumn("payload", Multimodal.syntheticGif($"media_id"))
      .select($"media_id", Multimodal.gifVideoStats($"payload").as("st"))
      .orderBy($"media_id")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val st = r.getStruct(1)
      val got = (st.getInt(0), st.getInt(1), st.getInt(2), st.getLong(3), st.getLong(4))
      assert(got === expect(id), s"id=$id")
    }
    // frame count really is multi-frame (the whole point of the path)
    assert(rows.forall(_.getStruct(1).getInt(0) >= 2))
    // non-GIF payloads (and GIF magic over garbage) yield null, never a crash
    val bad = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, "GIF89a-but-garbage-after-the-magic".getBytes("UTF-8"))).toDF("id", "payload")
      .select(Multimodal.gifVideoStats($"payload").as("st")).collect()
    bad.foreach(r => assert(r.isNullAt(0)))
  }

  test("GIF frame sampling decodes only every stride-th frame with exact gray sums") {
    def graySum(id: Long, t: Int) = {
      val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
      (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + t * 101 + x * 7 + y * 13) % 256).sum
    }
    // id 3 has 2 + 3%4 = 5 frames -> stride 2 samples frames 0, 2, 4
    val rows = Seq(3L).toDF("media_id")
      .withColumn("payload", Multimodal.syntheticGif($"media_id"))
      .select(explode(Multimodal.gifSampleFrames($"payload", stride = 2)).as("fr"))
      .select($"fr.frame_idx", $"fr.gray_sum")
      .orderBy($"frame_idx")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 2, 4))
    rows.foreach(r => assert(r.getLong(1) === graySum(3L, r.getInt(0))))
    // non-GIF payloads yield null (no rows after explode)
    val none = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
      .select(explode(Multimodal.gifSampleFrames($"payload", stride = 2)))
    assert(none.count() === 0L)
  }

  test("dHash: same-group images within 4 bits, cross-group far apart") {
    val fps = spark.range(0, 64).toDF("id")
      .withColumn("payload", Multimodal.syntheticGroupPng($"id", 16))
      .select($"id", Multimodal.imageDHash($"payload").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- 0L until 64L; b <- (a + 1) until 64L) {
      val ham = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if (a % 16 == b % 16)
        assert(ham <= 4, s"same-group pair ($a,$b) at Hamming $ham")
      else
        assert(ham > 6, s"cross-group pair ($a,$b) at Hamming $ham")
    }
  }

  test("perceptual banded pairs equal the brute-force Hamming pair set") {
    val fp = spark.range(0, 100).toDF("id")
      .withColumn("payload", Multimodal.syntheticGroupPng($"id", 16))
      .select($"id", Multimodal.imageDHash($"payload").as("fp"))
      .localCheckpoint()
    val banded = graft.operators.TextDedup.simhashPairsBandedFp(fp, maxHamming = 6)
      .orderBy($"id_a", $"id_b").collect().toSeq
    val a = fp.select($"id".as("id_a"), $"fp".as("fp_a"))
    val b = fp.select($"id".as("id_b"), $"fp".as("fp_b"))
    val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("ham", graft.operators.TextDedup.hamming($"fp_a", $"fp_b"))
      .filter($"ham" <= 6).select($"id_a", $"id_b", $"ham")
      .orderBy($"id_a", $"id_b").collect().toSeq
    assert(banded === brute)
    assert(banded.nonEmpty, "fixture produced no near-dup pairs")
  }

  test("dHash refuses frames it cannot pack (width/size guards) and junk bytes") {
    // 12×8 = 88 comparison bits > 64 → null; junk payload → null
    val wide = Seq(1L).toDF("id")
      .withColumn("p", Multimodal.syntheticPng($"id")) // 9×9 → (9-1)*9=72 > 64
      .select(Multimodal.imageDHash($"p")).head()
    assert(wide.isNullAt(0))
    val junk = Seq((1L, Array[Byte](9, 9, 9))).toDF("id", "p")
      .select(Multimodal.imageDHash($"p")).head()
    assert(junk.isNullAt(0))
  }

  test("real PNG resize scales the raster, not the bytes; stub payloads keep byte semantics") {
    val png = pngFixture()
    val df = Seq((1L, png)).toDF("media_id", "payload")
      .withColumn("meta", struct(lit("image/png").as("format"),
        length($"payload").cast("long").as("n_bytes"), lit("spec").as("source")))
    val half = Multimodal.resize(df, factor = 2)
    val out = Multimodal.decodeFeatures(half).head()
    assert(out.getInt(1) === 4 && out.getInt(2) === 2) // 8×4 → 4×2 raster
    // nearest-neighbor scaling of a half-red/half-white image preserves
    // the exact channel means
    val f = out.getSeq[Float](3)
    assert(f(0) === 1.0f && f(1) === 0.5f && f(2) === 0.5f)
  }

  test("audioFingerprint: gain-invariant (half-volume clip within ham 7), junk is null") {
    import org.apache.spark.sql.functions._
    val ids = (0L until 50L).toDF("id")
    val both = ids.select($"id",
      Multimodal.audioFingerprint(Multimodal.syntheticWav($"id")).as("fp_full"),
      Multimodal.audioFingerprint(Multimodal.syntheticWavHalved($"id")).as("fp_half"))
      .withColumn("ham", bit_count($"fp_full".bitwiseXOR($"fp_half")))
      .select($"id", $"ham").as[(Long, Int)].collect()
    both.foreach { case (id, ham) =>
      assert(ham <= 7, s"clip $id: half-volume fingerprint drifted $ham bits") }
    // deterministic across invocations
    val a = ids.select(Multimodal.audioFingerprint(
      Multimodal.syntheticWav($"id"))).as[Long].collect().toSeq
    val b = ids.select(Multimodal.audioFingerprint(
      Multimodal.syntheticWav($"id"))).as[Long].collect().toSeq
    assert(a === b)
    // non-audio payloads are null, not a throw
    val junk = Seq(Array[Byte](1, 2, 3, 4)).toDF("p")
      .select(Multimodal.audioFingerprint($"p")).collect()
    assert(junk.head.isNullAt(0))
  }

  test("audioFingerprint: a past-the-bound clip fingerprints exactly its first FpMaxFrames frames") {
    // the round-9 verdict's silent-overflow hazard: beyond ~1.6e7
    // frames the exact cross-multiplication leaves Long range. The
    // bound is now ENFORCED — prove (a) frames past FpMaxFrames are
    // ignored by definition (long ≡ truncated-at-bound), (b) the
    // capped envelope matches an exact-arithmetic oracle replay, and
    // (c) the arithmetic at the bound really is Long-exact.
    val cap = Multimodal.FpMaxFrames
    def wav(nFrames: Int): Array[Byte] = {
      val data = new Array[Byte](nFrames * 2)
      var j = 0
      while (j < nFrames) {
        val s = (((j.toLong * 7919) % 65536) - 32768).toInt
        data(2 * j) = (s & 0xff).toByte
        data(2 * j + 1) = ((s >> 8) & 0xff).toByte
        j += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val fps = Seq(("long", wav(cap + 400000)), ("trunc", wav(cap)))
      .toDF("which", "p")
      .select($"which", Multimodal.audioFingerprint($"p").as("fp"))
      .as[(String, Long)].collect().toMap
    assert(fps("long") === fps("trunc"),
      "frames past the excerpt bound moved the fingerprint")
    val segAbs = new Array[Long](64); val segCnt = new Array[Long](64)
    var total = 0L; var i = 0
    while (i < cap) {
      val a = math.abs(((i.toLong * 7919) % 65536) - 32768)
      val k = ((i.toLong * 64L) / cap).toInt
      segAbs(k) += a; segCnt(k) += 1; total += a
      i += 1
    }
    var expect = 0L
    for (k <- 0 until 64)
      if (segAbs(k) * cap > total * segCnt(k)) expect |= (1L << k)
    assert(fps("long") === expect, "capped envelope drifted from the oracle replay")
    assert(BigInt(32768L) * cap * cap < BigInt(Long.MaxValue),
      "FpMaxFrames no longer keeps the cross-products Long-exact")
  }
}
