package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** The JVM bit-twiddling reference the Column arithmetic must
    * reproduce — an independent statement of the Morton dilation. */
  private def spreadRef(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
  private def bucketRef(v: Long, min: Long, max: Long, bits: Int): Long = {
    val c = math.min(math.max(v, min), max)
    (c - min) * (1L << bits) / (max - min + 1)
  }

  test("zvalue2 reproduces the reference interleave (mixed magnitudes, clamping)") {
    val rows = (0 until 2000).map { i =>
      val x = (i * 2654435761L) % 100003L - 5000L // some below xMin
      val y = (i * 40503L) % 70001L
      (i.toLong, x, y)
    }
    val got = rows.toDF("id", "x", "y")
      .select($"id", ZOrder.zvalue2($"x", 0L, 90000L, $"y", 0L, 70000L,
        bits = 16).as("z"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, x, y) =>
      val want = spreadRef(bucketRef(x, 0L, 90000L, 16)) |
        (spreadRef(bucketRef(y, 0L, 70000L, 16)) << 1)
      assert(got(id) === want, s"id=$id x=$x y=$y")
    }
  }

  test("z-values are non-negative and within 2*bits bits") {
    val n = spark.range(0, 5000)
      .select(ZOrder.zvalue2(($"id" * 7919) % 1000000L, 0L, 999999L,
        ($"id" * 104729) % 1000000L, 0L, 999999L, bits = 20).as("z"))
      .filter($"z" < 0 || $"z" >= (1L << 40)).count()
    assert(n === 0)
  }

  test("curve locality: box queries touch far fewer files than a linear sort") {
    // full 256x256 grid -> 64 files each way; footer-box pruning is
    // then a pure geometry statement, not a data-luck one.
    val grid = spark.range(0, 65536L)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.layout(grid,
        ZOrder.zvalue2($"x", 0L, 255L, $"y", 0L, 255L, bits = 8), 64)
      .write.mode("overwrite").parquet(s"$base/z")
    grid.repartitionByRange(64, $"x")
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$base/linear")

    // selective in BOTH dims: a 64x4 slab
    val (zT1, zTot) = ZOrder.filesTouched(s"$base/z", spark,
      "x", 64, 127, "y", 64, 67)
    val (lT1, lTot) = ZOrder.filesTouched(s"$base/linear", spark,
      "x", 64, 127, "y", 64, 67)
    assert(zTot === 64 && lTot === 64, s"$zTot/$lTot")
    assert(zT1 < lT1, s"z touched $zT1, linear touched $lT1")

    // selective ONLY in the non-sort dim — the linear layout's blind
    // spot: every x-strip overlaps, z opens only one block row.
    val (zT2, _) = ZOrder.filesTouched(s"$base/z", spark,
      "x", 0, 255, "y", 100, 103)
    val (lT2, _) = ZOrder.filesTouched(s"$base/linear", spark,
      "x", 0, 255, "y", 100, 103)
    assert(lT2 === 64, s"linear should touch every file, got $lT2")
    assert(zT2 <= 16, s"z should touch ~one block row, got $zT2")
  }

  test("zvalue3 reproduces the bit-loop reference interleave") {
    def ref3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (d, i) =>
        d | ((x >> i) & 1) << (3 * i) | ((y >> i) & 1) << (3 * i + 1) |
          ((z >> i) & 1) << (3 * i + 2)
      }
    def bucketRef3(v: Long, max: Long, bits: Int): Long =
      math.min(math.max(v, 0L), max) * (1L << bits) / (max + 1)
    val rows = (0 until 1200).map { i =>
      (i.toLong, (i * 2654435761L) % 5000L, (i * 40503L) % 7001L,
        (i * 7919L) % 1024L)
    }
    val got = rows.toDF("id", "x", "y", "zz")
      .select($"id", ZOrder.zvalue3($"x", 0L, 4999L, $"y", 0L, 7000L,
        $"zz", 0L, 1023L, bits = 10).as("d"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, x, y, z) =>
      val want = ref3(bucketRef3(x, 4999L, 10), bucketRef3(y, 7000L, 10),
        bucketRef3(z, 1023L, 10), 10)
      assert(got(id) === want, s"id=$id")
    }
  }

  /** Independent JVM statement of the Hilbert recurrence. */
  private def hilbertRef(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert matches the reference recurrence (bits=16, mixed inputs)") {
    val rows = (0 until 1500).map { i =>
      (i.toLong, (i * 2654435761L) % 65536L, (i * 40503L) % 65536L)
    }
    val df = rows.toDF("id", "x", "y")
    val got = ZOrder.withHilbert(df, $"x", $"y", 16, "d")
      .select($"id", $"d").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, x, y) =>
      assert(got(id) === hilbertRef(x, y, 16), s"id=$id x=$x y=$y")
    }
  }

  test("hilbert is a bijection whose consecutive positions are grid-adjacent") {
    // the property Z-order famously lacks: on the full 32x32 grid,
    // d is exactly 0..1023 and |dx|+|dy| == 1 between neighbors on
    // the curve — no jumps, hence the tighter per-file boxes.
    val grid = spark.range(0, 1024L)
      .select(($"id" % 32).as("x"), ($"id" / 32).cast("long").as("y"))
    val walk = ZOrder.withHilbert(grid, $"x", $"y", 5, "d")
      .select($"d", $"x", $"y").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(walk.map(_._1).toSeq === (0L until 1024L), "bijection")
    walk.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) === 1L,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("hilbert plan stays linear in bits (no exponential expression blowup)") {
    val df = spark.range(0, 10L).select(($"id" % 4).as("x"), ($"id" % 3).as("y"))
    val plan = ZOrder.withHilbert(df, $"x", $"y", 16, "d")
      .queryExecution.executedPlan.toString
    assert(plan.length < 2000000, s"plan string ${plan.length} chars")
  }

  test("bucket guards degenerate ranges, bit widths, and exactness-breaking spans") {
    intercept[IllegalArgumentException] {
      ZOrder.bucket($"x", 10L, 10L, 8)
    }
    intercept[IllegalArgumentException] {
      ZOrder.bucket($"x", 0L, 10L, 32)
    }
    // a micros-scale year at 16 bits would overflow the 2^53 exact
    // window — must fail at construction, not mis-bucket silently
    intercept[IllegalArgumentException] {
      ZOrder.bucket($"x", 0L, (1L << 38), 16)
    }
  }

  test("hilbert fails loud on out-of-domain coordinates (no silent aliasing)") {
    val bad = Seq((1L, 5L, 40L)).toDF("id", "x", "y") // y >= 2^5
    val e = intercept[Exception] {
      ZOrder.withHilbert(bad, $"x", $"y", 5, "d").collect()
    }
    assert(e.getMessage != null)
  }
}
