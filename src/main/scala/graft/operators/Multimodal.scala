package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque BINARY + typed metadata.
  *
  * The decode path is REAL for the formats the stock JVM ships codecs
  * for — PNG/JPEG/GIF/BMP via pure-JVM `javax.imageio`, PCM WAV/AIFF/
  * AU audio via `javax.sound.sampled` ([[Multimodal.audioStats]]), no
  * native libs — detected by payload magic bytes; any other payload
  * (compressed audio, video containers) falls back to the deterministic
  * byte-statistics stub (which is what the text-bytes fixtures
  * exercise, keeping q60–q62's DuckDB oracles bit-exact). Video is
  * REAL for multi-frame GIF ([[Multimodal.gifVideoStats]] — frame
  * count, gray sums, inter-frame motion, all integer-exact under
  * q131's hash gate); MP4/Matroska ship no JDK demuxer, so those
  * containers fall back to the byte-window stub (frame sampling
  * included). Either way the plan is the deliverable:
  * decode is a narrow per-partition map with no shuffle, exactly how a
  * 100 TB media table wants to be processed (data-local, no driver
  * involvement, columnar in/out).
  */
/** Named struct for [[Multimodal.wavStats]] — field names become the
  * struct's column names when the UDF result is star-expanded. */
case class WavStatsRow(
    sample_rate: Int, channels: Int, n_frames: Long, duration_ms: Long,
    peak_0: Long, sum_abs_0: Long, sum_sq_0: Long,
    peak_1: Long, sum_abs_1: Long, sum_sq_1: Long)

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

  /** Magic-byte sniff for the container formats `javax.imageio` decodes
    * on any stock JVM. Cheaper and more honest than trusting metadata:
    * a mislabeled payload can't crash the decode path. */
  private[operators] def looksLikeImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && (
      ((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** REAL image decode + feature extraction (pure-JVM `javax.imageio`).
    * Width/height from the decoded raster; 8-dim feature vector =
    * [meanR, meanG, meanB, meanLum, lumHist0..3] — all accumulated as
    * exact integers over the pixels with ONE double division per lane
    * (deterministic across JVMs and retries, same discipline as the
    * stub). Luminance = (299r + 587g + 114b) / 1000 integer-truncated;
    * histogram bins are 64-wide. Returns null when ImageIO has no codec
    * for the payload — the caller falls back to [[stubDecode]].
    *
    * Per-pixel getRGB is fine at spec scale; a production build would
    * read the raster row-buffered — still inside this same narrow
    * partition map, nothing about the plan changes. */
  private[operators] def imageDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    // NonFatal, not just IOException: the JDK readers throw
    // IllegalArgumentException / ArrayIndexOutOfBounds / NegativeArraySize
    // on malformed headers that pass the magic-byte sniff — one bad row
    // must fall back to the stub, never kill the stage
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) null
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      val hist = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val lum = (r * 299 + g * 587 + b * 114) / 1000
          sl += lum
          hist(math.min(3, lum / 64)) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val f = new Array[Float](8)
      f(0) = (sr.toDouble / (255.0 * n)).toFloat
      f(1) = (sg.toDouble / (255.0 * n)).toFloat
      f(2) = (sb.toDouble / (255.0 * n)).toFloat
      f(3) = (sl.toDouble / (255.0 * n)).toFloat
      var j = 0
      while (j < 4) { f(4 + j) = (hist(j).toDouble / n).toFloat; j += 1 }
      (w, h, f)
    }
  }

  /** STUB decode — stands in for the formats with no in-container codec
    * (audio features, exotic image containers). Deterministic: 8-dim
    * "feature vector" derived from byte statistics, plus width/height
    * pretending to be image dims. The signature and the
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
    * no shuffle, no driver data movement. Real `javax.imageio` decode
    * for PNG/JPEG/GIF/BMP payloads (magic-byte detected), byte-stat
    * stub for everything else — one codepath, the row decides. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    graft.GraftSession.widen(media.select(col("media_id"), col("payload"))).mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val decoded =
          if (looksLikeImage(payload)) imageDecode(payload) else null
        val (w, h, f) = if (decoded != null) decoded else stubDecode(payload)
        Row(r.getLong(0), w, h, f)
      }
    }(enc)
  }

  /** Resize by integer `factor`: REAL raster scaling for decodable
    * image payloads (Graphics2D nearest-neighbor draw onto a
    * width/factor × height/factor canvas, re-encoded as PNG —
    * deterministic), byte downsample for everything else. Either way a
    * narrow partition-parallel map, no shuffle. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0)
    val f = udf { (payload: Array[Byte]) =>
      val img =
        if (looksLikeImage(payload))
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case scala.util.control.NonFatal(_) => null } // see imageDecode
        else null
      if (img != null) {
        val nw = math.max(1, img.getWidth / factor)
        val nh = math.max(1, img.getHeight / factor)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      } else if (payload == null) null
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

  /** Deterministic synthetic image, encoded as a REAL PNG via
    * `javax.imageio` — pixel(x,y) of image `id` is the closed-form RGB
    * ((id·31+x·7+y·13) mod 256, (id·17+x·3+y·5) mod 256,
    * (id·23+x·11+y·2) mod 256) over an (8+id mod 5)×(8+id mod 3)
    * canvas. PNG is lossless, so a decode recovers the formula exactly;
    * q90 uses this to put the real codec path under the driver's hash
    * gate (the oracle computes the same sums from the formula, never
    * touching a codec). */
  def syntheticPng(id: Column): Column = {
    val f = udf { (id: Long) =>
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
          val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
          val b = ((id * 23 + x * 11 + y * 2) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    f(id)
  }

  /** 32-bit xorshift-multiply mix — the pixel noise for
    * [[syntheticGroupPng]]. Every step is exact BIGINT arithmetic
    * (multiply mod 2^32, xor with a right shift) so DuckDB reproduces
    * it with `xor` / `//` / `%` — unlike a bare linear congruence,
    * adjacent inputs decorrelate, which is what makes cross-group
    * dHash distances concentrate near 32 bits (see q140). */
  private[operators] def mix32(k: Long): Int = {
    var v = (k * 2654435761L) & 0xffffffffL
    v = v ^ (v >>> 16)
    v = (v * 2246822519L) & 0xffffffffL
    v = v ^ (v >>> 13)
    (v % 256L).toInt
  }

  /** Deterministic GROUP-structured synthetic image, encoded as a real
    * PNG: all ids with the same `id mod groups` share one 9×8 grayscale
    * noise pattern ([[mix32]] of the group-keyed pixel index), and each
    * id additionally inverts the single pixel at
    * ((id·7) mod 9, (id·5) mod 8). Same-group images therefore differ
    * in ≤ 2 pixels → ≤ 4 dHash bits, while cross-group patterns are
    * independent noise (expected Hamming ≈ 32, P(≤6) ≈ 1e-12 per
    * pair) — a ground-truthed near-duplicate corpus for perceptual
    * dedup, closed-form enough for a DuckDB oracle that never touches
    * a codec. Pixels are gray (r=g=b), so the decoder's integer
    * luminance (299r+587g+114b)/1000 recovers the formula value
    * exactly. */
  def syntheticGroupPng(id: Column, groups: Int): Column = {
    val g = groups
    val f = udf { (id: Long) =>
      val w = 9; val h = 8
      val gid = id % g
      val px = (id * 7 % w).toInt; val py = (id * 5 % h).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = mix32(gid * 1000003L + x + y * 9L)
          val v = if (x == px && y == py) 255 - base else base
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    f(id)
  }

  /** Perceptual difference hash (dHash) from a REAL `javax.imageio`
    * decode: integer luminance (299r+587g+114b)/1000 per pixel, bit
    * y·(w−1)+x set iff lum(x,y) < lum(x+1,y). The canonical 9×8 input
    * yields the classic 64-bit fingerprint; any w·h with
    * (w−1)·h ≤ 64 packs the same way, larger frames or undecodable
    * payloads → null (decode-don't-guess, as [[imageChannelSums]]).
    * In production the 9×8 comes from a box-downsample of the raw
    * image; here the input IS 9×8 so the hash — and the near-dup pairs
    * built from it — are deterministic and oracle-able end to end.
    * Near-dup mining reuses the banded Hamming machinery
    * ([[graft.operators.TextDedup.simhashPairsBandedFp]]): perceptual
    * image dedup is SimHash dedup over a different fingerprint. */
  def imageDHash(payload: Column): Column = {
    val f = udf { (p: Array[Byte]) =>
      val img =
        if (p == null) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w < 2 || (w - 1) * h > 64) None
        else {
          def lum(x: Int, y: Int): Int = {
            val rgb = img.getRGB(x, y)
            (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
          }
          var fp = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w - 1) {
              if (lum(x, y) < lum(x + 1, y)) fp |= 1L << (y * (w - 1) + x)
              x += 1
            }
            y += 1
          }
          Some(fp)
        }
      }
    }
    f(payload)
  }

  /** Exact integer channel statistics from a REAL `javax.imageio`
    * decode: (width, height, sum_r, sum_g, sum_b) — all integers, no
    * float rounding anywhere, so the output is hash-comparable against
    * an engine that never decodes (q90's closed-form oracle). Null when
    * the payload doesn't decode (same NonFatal discipline as
    * [[imageDecode]]). */
  def imageChannelSums(payload: Column): Column = {
    val f = udf { (p: Array[Byte]) =>
      val img =
        if (p == null) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        (w, h, sr, sg, sb)
      }
    }
    f(payload)
  }

  /** RIFF/WAVE magic sniff — the audio analog of [[looksLikeImage]]. */
  private[operators] def looksLikeWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** FORM/AIFF magic sniff (IFF container, AIFF form type). */
  private[operators] def looksLikeAiff(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
      p(8) == 'A' && p(9) == 'I' && p(10) == 'F' && p(11) == 'F'

  /** Sun/NeXT .snd (AU) magic sniff. */
  private[operators] def looksLikeAu(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 &&
      p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'

  /** The three uncompressed-PCM containers the stock JVM decodes —
    * everything `javax.sound.sampled` handles without native codecs.
    * Compressed/container formats (MP3, MP4, Ogg) ship no JDK codec
    * and stay on the byte-stats stub: a permanent JDK boundary. */
  private[operators] def looksLikeAudio(p: Array[Byte]): Boolean =
    looksLikeWav(p) || looksLikeAiff(p) || looksLikeAu(p)

  /** Integer-exact per-channel audio statistics from a REAL
    * `javax.sound.sampled` decode (pure JDK — no container codecs
    * needed, unlike compressed audio), for ALL THREE PCM containers
    * the JDK reads: WAV (little-endian), AIFF and AU (big-endian; the
    * sample loop is endian-aware via the decoded format). Emits sample
    * rate, channel count, frame count, integer-truncated duration_ms,
    * and per channel the peak |sample|, Σ|sample| and Σsample²
    * accumulated as exact Longs (an RMS is one sqrt away, but the
    * OUTPUT stays integer so any engine can reproduce it bit-for-bit —
    * the q90 discipline, applied to audio). PCM16 only (what these
    * containers overwhelmingly carry); anything else — or a payload
    * that is not audio at all — returns null and the caller falls back
    * to the byte-stats stub. Null second-channel lanes are 0 for mono.
    * One narrow UDF, no shuffle. */
  /** Shared PCM16 decode behind [[audioStats]] and
    * [[audioFingerprint]]: container sniff, format guards (the
    * contract is None-and-fall-back, never a task-killing throw),
    * raw sample bytes. Returns (channels, sampleRate, isBigEndian,
    * data). */
  private def decodePcm16(p: Array[Byte])
      : Option[(Int, Int, Boolean, Array[Byte])] = {
    val ais =
      if (!looksLikeAudio(p)) null
      else
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p))
        catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) None
    else {
      val fmt = ais.getFormat
      // header sanity bounds, not just encoding: a crafted/corrupt
      // fmt chunk reporting 0 channels or a 0 sample rate would
      // divide by zero downstream
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 ||
          fmt.getChannels < 1 || fmt.getChannels > 2 ||
          fmt.getSampleRate <= 0f || fmt.getSampleRate.isNaN) None
      else try {
        Some((fmt.getChannels, fmt.getSampleRate.toInt, fmt.isBigEndian,
          ais.readAllBytes()))
      } catch { // truncated/corrupt data section: same None contract
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  /** [[audioFingerprint]]'s excerpt bound: the envelope covers the
    * first 1e7 frames of the first channel — the largest round number
    * keeping the exact integer cross-multiplication (≤ 32768·n²)
    * comfortably inside a Long. */
  val FpMaxFrames: Int = 10000000

  /** PCM16 sample `j` (interleaved index) from raw data bytes. */
  @inline private def sampleAt(bytes: Array[Byte], j: Int, big: Boolean): Int = {
    val lo = if (big) bytes(2 * j + 1) else bytes(2 * j)
    val hi = if (big) bytes(2 * j) else bytes(2 * j + 1)
    ((hi.toInt << 8) | (lo.toInt & 0xff)).toShort.toInt
  }

  def audioStats(payload: Column): Column = {
    val f = udf { (p: Array[Byte]) =>
      decodePcm16(p) match {
        case None => null
        case Some((channels, rate, big, bytes)) =>
          val nFrames = bytes.length / (2 * channels)
          val peak = new Array[Long](2)
          val sumAbs = new Array[Long](2)
          val sumSq = new Array[Long](2)
          var j = 0
          val total = nFrames * channels
          while (j < total) {
            val s = sampleAt(bytes, j, big).toLong
            val c = j % channels
            val a = math.abs(s)
            if (a > peak(c)) peak(c) = a
            sumAbs(c) += a
            sumSq(c) += s * s
            j += 1
          }
          WavStatsRow(rate, channels, nFrames.toLong,
            nFrames.toLong * 1000L / rate,
            peak(0), sumAbs(0), sumSq(0), peak(1), sumAbs(1), sumSq(1))
      }
    }
    f(payload)
  }

  /** Back-compat name for [[audioStats]] (q120 predates the AIFF/AU
    * extension; same decode, wider sniff). */
  def wavStats(payload: Column): Column = audioStats(payload)

  /** Perceptual 64-bit AUDIO fingerprint — the [[imageDHash]] analog
    * for sound: the first channel's |sample| stream is cut into 64
    * equal segments and bit k is set when segment k's mean loudness
    * exceeds the clip's mean (compared by exact integer
    * cross-multiplication, so the bit pattern is engine-reproducible
    * and — crucially — INVARIANT to uniform gain: the same clip at
    * half volume fingerprints (near-)identically, which is what makes
    * banded-Hamming pairing on this signature a perceptual dedup).
    * Null on anything [[decodePcm16]] rejects. Cross-products are
    * bounded by 32768·nFrames², exact in a Long only up to ~1.6e7
    * frames — so the fingerprint is ENFORCED to cover the first
    * [[FpMaxFrames]] (1e7) frames (≈ 3.8 min at 44.1 kHz; bound
    * 32768·1e14 ≈ 3.3e18 < 2^63): a podcast-length clip fingerprints
    * its leading excerpt deterministically instead of silently
    * corrupting bits past the overflow point (round-10 verdict #2 —
    * the cap is part of the fingerprint's definition, mirrored in the
    * q204/q205 oracle and pinned by the long-clip spec). */
  def audioFingerprint(payload: Column): Column = {
    val f = udf { (p: Array[Byte]) =>
      decodePcm16(p) match {
        case None => null
        case Some((channels, _, big, bytes)) =>
          val n = math.min(bytes.length / (2 * channels), FpMaxFrames)
          if (n == 0) null
          else {
            val segAbs = new Array[Long](64)
            val segCnt = new Array[Long](64)
            var total = 0L
            var i = 0
            while (i < n) {
              val a = math.abs(sampleAt(bytes, i * channels, big).toLong)
              val k = ((i.toLong * 64L) / n).toInt
              segAbs(k) += a; segCnt(k) += 1; total += a
              i += 1
            }
            var fp = 0L
            var k = 0
            while (k < 64) {
              if (segAbs(k) * n > total * segCnt(k)) fp |= (1L << k)
              k += 1
            }
            java.lang.Long.valueOf(fp)
          }
      }
    }
    f(payload)
  }

  /** One synthetic clip's PCM16 frames encoded into a real container:
    * flat sample j of clip `id` is the closed-form
    * ((id·31 + j·7919) mod 65536) − 32768 over (64 + id mod 33)
    * frames, (1 + id mod 2) channels interleaved, 8000·(1 + id mod 3)
    * Hz. Bytes are laid out in the endianness the target container
    * expects (the JDK writers do not transcode), so WAV/AIFF/AU all
    * carry the SAME samples losslessly and decode to identical integer
    * lanes — which is exactly what q161 proves. */
  private def encodeSynthetic(id: Long, big: Boolean,
      t: javax.sound.sampled.AudioFileFormat.Type,
      halve: Boolean = false): Array[Byte] = {
    val channels = 1 + (id % 2).toInt
    val rate = 8000 * (1 + (id % 3).toInt)
    val nFrames = (64 + id % 33).toInt
    val data = new Array[Byte](nFrames * channels * 2)
    var j = 0
    while (j < nFrames * channels) {
      val s0 = (((id * 31 + j.toLong * 7919) % 65536) - 32768).toInt
      // the "same clip, half volume" variant: integer truncation
      // toward zero (the oracle mirrors with trunc(s/2.0))
      val s = if (halve) s0 / 2 else s0
      if (big) {
        data(2 * j) = ((s >> 8) & 0xff).toByte
        data(2 * j + 1) = (s & 0xff).toByte
      } else {
        data(2 * j) = (s & 0xff).toByte
        data(2 * j + 1) = ((s >> 8) & 0xff).toByte
      }
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, channels, true, big)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, t, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic audio as a REAL PCM16 WAV (see
    * [[encodeSynthetic]] for the sample formula); q120 uses this to
    * put the real audio codec path under the driver's hash gate (the
    * oracle computes the same integer sums from the formula, never
    * touching an audio API). */
  def syntheticWav(id: Column): Column = {
    val f = udf { (id: Long) =>
      encodeSynthetic(id, big = false,
        javax.sound.sampled.AudioFileFormat.Type.WAVE)
    }
    f(id)
  }

  /** [[syntheticWav]] at half volume (every sample integer-halved,
    * truncation toward zero): the perceptual-duplicate fixture for the
    * audio near-dup path — same clip, different gain. */
  def syntheticWavHalved(id: Column): Column = {
    val f = udf { (id: Long) =>
      encodeSynthetic(id, big = false,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, halve = true)
    }
    f(id)
  }

  /** [[syntheticWav]] generalized over the container: `format` ∈
    * wav|aiff|au selects the file type (endianness to match — the IFF
    * family is big-endian). Unknown format labels fail the task loudly
    * rather than emitting a payload that silently stubs downstream. */
  def syntheticAudio(id: Column, format: Column): Column = {
    val f = udf { (id: Long, fmt: String) =>
      fmt match {
        case "wav" => encodeSynthetic(id, big = false,
          javax.sound.sampled.AudioFileFormat.Type.WAVE)
        case "aiff" => encodeSynthetic(id, big = true,
          javax.sound.sampled.AudioFileFormat.Type.AIFF)
        case "au" => encodeSynthetic(id, big = true,
          javax.sound.sampled.AudioFileFormat.Type.AU)
        case other => throw new IllegalArgumentException(
          s"syntheticAudio: unknown container '$other' (wav|aiff|au)")
      }
    }
    f(id, format)
  }

  /** GIF magic sniff (87a/89a) — animated GIF is the one real
    * multi-frame (video) container a stock JVM can both encode and
    * decode, so it is the honest pure-JDK stand-in for the MP4/Matroska
    * demuxers that do NOT ship with the JDK. */
  private[operators] def looksLikeGif(p: Array[Byte]): Boolean =
    p != null && p.length >= 6 &&
      p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  /** The 256-entry grayscale palette shared by the synthetic GIF
    * encoder and (implicitly) the decode check: index v maps to RGB
    * (v,v,v), so an indexed frame stores its gray plane LOSSLESSLY —
    * GIF's LZW is lossless over indices, the palette is exact, and a
    * decode recovers every sample bit-for-bit. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** REAL multi-frame video decode + temporal features (pure-JVM
    * `javax.imageio` GIF reader): frame count, dimensions, the exact
    * integer gray sum over all frames, and a motion signal — the
    * summed absolute per-pixel gray delta between consecutive frames
    * (the classic scene-change / static-clip detector). All lanes are
    * exact integers (gray = (299r+587g+114b)/1000 truncated, the
    * [[imageDecode]] luminance), so a closed-form oracle that never
    * touches a codec can reproduce them — the q90/q120 discipline,
    * applied to video. Null when the payload is not a decodable GIF;
    * callers fall back to the byte-stats stub. One narrow UDF, no
    * shuffle, frames streamed one at a time (memory = 2 frames). */
  def gifVideoStats(payload: Column): Column = {
    val f = udf { (p: Array[Byte]) =>
      if (!looksLikeGif(p)) null
      else {
        var reader: javax.imageio.ImageReader = null
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(p))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            reader = readers.next()
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            if (n <= 0) null
            else {
              var w = 0; var h = 0
              var sumGray = 0L; var motion = 0L
              var prev: Array[Int] = null
              var t = 0
              var ok = true
              while (ok && t < n) {
                val img = reader.read(t)
                if (t == 0) { w = img.getWidth; h = img.getHeight }
                // a frame smaller than frame 0 (GIF allows sub-rect
                // frames) would make the motion delta ill-defined —
                // the synthetic clips never do this, foreign GIFs that
                // do fall back to the stub rather than emit a lie
                if (img.getWidth != w || img.getHeight != h) ok = false
                else {
                  val cur = new Array[Int](w * h)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y)
                      val lum = (((rgb >> 16) & 0xff) * 299 +
                        ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                      cur(y * w + x) = lum
                      sumGray += lum
                      if (prev != null) motion += math.abs(lum - prev(y * w + x))
                      x += 1
                    }
                    y += 1
                  }
                  prev = cur
                  t += 1
                }
              }
              if (!ok) null else (n, w, h, sumGray, motion)
            }
          }
        } catch { // malformed stream past the magic sniff: null-and-fall-back
          case scala.util.control.NonFatal(_) => null
        } finally if (reader != null) reader.dispose()
      }
    }
    f(payload)
  }

  /** Deterministic synthetic video clip, encoded as a REAL animated
    * GIF via `javax.imageio.ImageWriter.writeToSequence` — gray sample
    * of clip `id`, frame t, pixel (x,y) is the closed form
    * ((id·31 + t·101 + x·7 + y·13) mod 256) over a
    * (8 + id mod 5)×(8 + id mod 3) canvas × (2 + id mod 4) frames,
    * drawn into indexed frames over the identity gray palette (GIF is
    * lossless over palette indices). q131 decodes these through the
    * production [[gifVideoStats]] path and hash-matches a closed-form
    * DuckDB oracle, proving the multi-frame codec path is real. */
  def syntheticGif(id: Column): Column = {
    val f = udf { (id: Long) =>
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      val nFrames = 2 + (id % 4).toInt
      val cm = grayPalette
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var t = 0
        while (t < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                ((id * 31 + t * 101 + x * 7 + y * 13) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          t += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    f(id)
  }

  /** Named struct for [[Multimodal.gifSampleFrames]] — one row per
    * SAMPLED frame after the explode. */
  case class GifFrameRow(frame_idx: Int, width: Int, height: Int, gray_sum: Long)

  /** REAL video frame sampling: decode every `stride`-th frame of a
    * multi-frame GIF (the training-pipeline keyframe-extraction shape —
    * a video contributes a bounded subset of frames, not all of them)
    * and emit per-frame integer gray sums. Unsampled frames are never
    * rasterized — `ImageReader.read(t)` pulls only the requested
    * image, so the decode cost follows the SAMPLE, which is the point
    * of striding. Returns an array of (frame_idx, width, height,
    * gray_sum) structs for the caller to explode (one narrow UDF +
    * one Generate, no shuffle); null for non-GIF payloads. */
  def gifSampleFrames(payload: Column, stride: Int): Column = {
    require(stride > 0)
    val st = stride
    val f = udf { (p: Array[Byte]) =>
      if (!looksLikeGif(p)) null
      else {
        var reader: javax.imageio.ImageReader = null
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(p))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            reader = readers.next()
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            if (n <= 0) null
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[GifFrameRow]
              var t = 0
              while (t < n) {
                val img = reader.read(t)
                val w = img.getWidth
                val h = img.getHeight
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    sum += (((rgb >> 16) & 0xff) * 299 +
                      ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                    x += 1
                  }
                  y += 1
                }
                out += GifFrameRow(t, w, h, sum)
                t += st
              }
              out.toSeq
            }
          }
        } catch { // malformed stream past the magic sniff: null-and-fall-back
          case scala.util.control.NonFatal(_) => null
        } finally if (reader != null) reader.dispose()
      }
    }
    f(payload)
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
