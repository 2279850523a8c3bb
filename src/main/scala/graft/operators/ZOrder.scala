package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve, Morton 1966; Hilbert curve per Hilbert
  * 1891 via the standard published xy→d reflect-rotate formulation)
  * data layout — the storage-side lever the
  * scan-heavy operators lean on at 100 TB. A table sorted on ONE
  * column prunes scans on that column only; a table laid out by the
  * interleaved bits of TWO dimensions clusters rows that are close in
  * BOTH, so a file's (min, max) footer box is tight in both dimensions
  * and a reader with a 2-predicate box query opens only the files
  * whose boxes intersect it. This is layout-time work: one
  * range-partitioned sort at write, zero cost at read — exactly where
  * a 1000-executor cluster wants its effort.
  *
  * The z-value is PURE integer arithmetic (clamp → fixed-width bucket
  * → magic-mask bit spreading → interleave), deliberately expressible
  * in both Spark and ANSI-ish SQL: the q229 gate hash-matches DuckDB
  * replaying the identical shifts and masks, so the curve itself — not
  * just its side effects — is under the oracle. Buckets come from a
  * CALLER-DECLARED [min, max] per dimension (clamped outside), not
  * from data-dependent quantiles: the mapping is then deterministic,
  * mirrorable, and stable as the table grows — append waves land in
  * the same curve without re-ranking the corpus (the same
  * frozen-parameter discipline as the IVF centroids and the epoch-key
  * arithmetic).
  *
  * Bit spreading is the classic 5-step mask cascade (2D): 32 source
  * bits fan out to the 64 even positions in O(1) ops/row, no loop, no
  * UDF — whole-stage codegen keeps it in the scan's generated code.
  * `bits ≤ 31` keeps the interleaved value in a non-negative Long.
  *
  * Relationship to [[graft.sources.Sinks.mortonCode2]] (q66, SQL fn
  * `morton_code`): that is the fail-loud RAW-domain face (inputs must
  * already fit in `bits`; out-of-range raises); [[zvalue2]] is the
  * declared-range face (wide domains bucket first, outliers clamp).
  * Both interleave through the ONE [[spread]] cascade. */
object ZOrder {

  /** Clamp to [min, max] and scale to an unsigned `bits`-wide bucket:
    * ⌊(v − min)·2^bits / (max − min + 1)⌋. All intermediates stay
    * < 2⁵³ for bits ≤ 31 and 32-bit-ish ranges, so the double division
    * is exact (the RangeJoin.binned argument, same arithmetic). */
  def bucket(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(max > min, s"degenerate range [$min, $max]")
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // (v − min)·2^bits must stay < 2⁵³ or the double division stops
    // being exactly integer division (silently shifting bucket
    // boundaries AND diverging from any //-based mirror, e.g. the
    // q229/q233 oracles). Fail loud at construction: callers with
    // wider domains coarsen units first (q229 buckets SECONDS, not
    // the 3e13-wide micros range).
    // BigInt, not Long: max − min itself overflows for extreme
    // declared ranges (min near Long.MinValue, max positive), and an
    // overflowed NEGATIVE span would sail through a Long compare —
    // turning the fail-loud guard into division-by-zero / garbage
    // buckets downstream.
    require(BigInt(max) - BigInt(min) < BigInt(1L << (53 - bits)),
      s"range [$min, $max] too wide for exact $bits-bit bucketing " +
        s"(max span ${(1L << (53 - bits)) - 1}); coarsen the units first")
    val clamped = least(greatest(c.cast("long"), lit(min)), lit(max))
    floor((clamped - min) * (1L << bits) / (max - min + 1)).cast("long")
  }

  /** Spread the low 32 bits of `c` to the even bit positions 0,2,…,62
    * (Morton dilation): 5 shift-or-mask steps, each separating one
    * power-of-two group. */
  def spread(c: Column): Column = {
    val steps = Seq(
      16 -> 281470681808895L,    // 0x0000FFFF0000FFFF
      8 -> 71777214294589695L,   // 0x00FF00FF00FF00FF
      4 -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
      2 -> 3689348814741910323L, // 0x3333333333333333
      1 -> 6148914691236517205L) // 0x5555555555555555
    steps.foldLeft(c.bitwiseAND(lit(4294967295L))) { case (x, (sh, mask)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }
  }

  /** 2-D z-value: bucket each dimension to `bits` bits over its
    * declared range, interleave (x gets the even positions, y the
    * odd). Total 2·bits ≤ 62 bits — always a non-negative Long. */
  def zvalue2(x: Column, xMin: Long, xMax: Long,
      y: Column, yMin: Long, yMax: Long, bits: Int = 16): Column =
    spread(bucket(x, xMin, xMax, bits))
      .bitwiseOR(shiftleft(spread(bucket(y, yMin, yMax, bits)), 1))

  /** 3-way Morton dilation: the low 21 bits of `c` fan out to
    * positions 0,3,6,…,60 — same cascade idea as [[spread]] with the
    * stride-3 mask set. */
  def spread3(c: Column): Column = {
    val steps = Seq(
      32 -> 8725724278095871L,   // 0x001F00000000FFFF
      16 -> 8725728556220671L,   // 0x001F0000FF0000FF
      8 -> 1157144660301377551L, // 0x100F00F00F00F00F
      4 -> 1207822528635744451L, // 0x10C30C30C30C30C3
      2 -> 1317624576693539401L) // 0x1249249249249249
    steps.foldLeft(c.bitwiseAND(lit(2097151L))) { case (x, (sh, mask)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }
  }

  /** 3-D z-value — the (entity × time × shard)-style layout: three
    * declared-range bucketed dimensions interleaved x→0,3,…, y→1,4,…,
    * z→2,5,…; `bits ≤ 20` keeps 3·bits ≤ 60 non-negative. */
  def zvalue3(x: Column, xMin: Long, xMax: Long,
      y: Column, yMin: Long, yMax: Long,
      z: Column, zMin: Long, zMax: Long, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    spread3(bucket(x, xMin, xMax, bits))
      .bitwiseOR(shiftleft(spread3(bucket(y, yMin, yMax, bits)), 1))
      .bitwiseOR(shiftleft(spread3(bucket(z, zMin, zMax, bits)), 2))
  }

  /** Lay `df` out along the curve: range-partition by z (each output
    * file owns a contiguous curve segment — a tight box in BOTH
    * dimensions), sort within partitions so row-group stats are tight
    * too. `numFiles` is the write parallelism knob: at 100 TB pick
    * target-file-size, not a count. The z column is layout scaffolding
    * and is dropped from the written schema. */
  def layout(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")

  /** HILBERT curve position (xy→d, the classic per-bit
    * reflect-and-rotate recurrence) — the better-locality layout
    * face: unlike Z, the Hilbert curve never jumps (consecutive d are
    * Manhattan-adjacent cells — an EXACT property, specced as a
    * bijection + adjacency walk over a full grid), so a file owning a
    * contiguous d-range has a tighter bounding box than the same-size
    * z-range, which is the whole game for footer-stats pruning.
    *
    * Inputs are already-bucketed coordinates in [0, 2^bits) (compose
    * with [[bucket]] for wide domains — same contract as
    * [[graft.sources.Sinks.mortonCode2]]'s checked raw domain).
    *
    * Shape: the recurrence carries (x, y, d) state across `bits`
    * rounds, so a single Column expression would DOUBLE its tree per
    * round (x feeds both next-x and next-y) — 2^bits nodes by the
    * end. Instead each round lands in named columns via one
    * `select` per round: rx/ry/nx/ny are small when-trees over the
    * PREVIOUS round's attributes, Catalyst's CollapseProject keeps
    * non-cheap expressions un-inlined, and whole-stage codegen fuses
    * the ~`bits` projections into one pass — the plan is linear in
    * `bits`, not exponential. Hence a DataFrame transform, not a
    * Column. */
  def withHilbert(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // same fail-loud domain contract as mortonCode2's checked(): an
    // out-of-range coordinate would silently alias cells 2^bits apart
    // and break the adjacency/bounding-box property the layout exists
    // for; negatives would corrupt the reflect arithmetic
    val max = 1L << bits
    def checked(c: Column) = {
      val l = c.cast("long")
      when(l < 0 || l >= max, raise_error(concat(
        lit(s"withHilbert: input outside [0, $max): "), l.cast("string"))))
        .otherwise(l)
    }
    val (hx, hy, rx, ry) = ("__graft_hx", "__graft_hy", "__graft_rx", "__graft_ry")
    var cur = df.select(col("*"), checked(x).as(hx),
      checked(y).as(hy), lit(0L).as(out))
    var s = 1L << (bits - 1)
    while (s > 0) {
      cur = cur.select(col("*"),
        when(col(hx).bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)).as(rx),
        when(col(hy).bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)).as(ry))
      val nd = col(out) + lit(s) * lit(s) *
        (lit(3L) * col(rx)).bitwiseXOR(col(ry))
      // rot: if ry == 0 { if rx == 1 reflect; swap } else keep
      val nx = when(col(ry) === 0,
        when(col(rx) === 1, lit(s - 1) - col(hy)).otherwise(col(hy)))
        .otherwise(col(hx))
      val ny = when(col(ry) === 0,
        when(col(rx) === 1, lit(s - 1) - col(hx)).otherwise(col(hx)))
        .otherwise(col(hy))
      cur = cur
        .withColumn("__graft_nd", nd)
        .withColumn("__graft_nx", nx)
        .withColumn("__graft_ny", ny)
        .drop(hx, hy, rx, ry, out)
        .withColumnRenamed("__graft_nx", hx)
        .withColumnRenamed("__graft_ny", hy)
        .withColumnRenamed("__graft_nd", out)
      s >>= 1
    }
    cur.drop(hx, hy)
  }

  /** The 2-D Hilbert index as a scalar Column — the native-expression
    * face of [[withHilbert]] (bit-identical curve, HilbertExprSpec
    * pins the equality on a full grid). Same checked [0, 2^bits)
    * domain. Use this form inside arbitrary expressions and SQL
    * (`hilbert_d`); use [[withHilbert]] when you want the pure
    * Column-free transform. */
  def hilbertIndex2(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.HilbertIndex(
      GraftBridge.expression(x), GraftBridge.expression(y), bits))
  }

  /** The 3-D Hilbert index (Skilling transform) — the better-locality
    * counterpart of [[zvalue3]] for the entity × time × shard layout:
    * unlike 3-D Morton the curve never jumps, so a contiguous d-range
    * owns a tighter 3-D box (ProbeR17's blind-spot measurement).
    * Inputs are already-bucketed coordinates in [0, 2^bits) (compose
    * with [[bucket]]); bits ≤ 20 keeps the index in a non-negative
    * Long. SQL face: `hilbert_d3`. */
  def hilbertIndex3(x: Column, y: Column, z: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.HilbertIndex3(
      GraftBridge.expression(x), GraftBridge.expression(y),
      GraftBridge.expression(z), bits))
  }

  /** The read-side pruning metric the layout exists for: how many
    * files must a box query (`xLo ≤ x ≤ xHi ∧ yLo ≤ y ≤ yHi`) open?
    * Computes each file's footer-equivalent (min, max) per dimension
    * from the data itself and counts files whose stats box intersects
    * the query box — exactly the decision a parquet reader makes from
    * column-chunk statistics, measured engine-independently. */
  def filesTouched(parquetDir: String, spark: org.apache.spark.sql.SparkSession,
      xCol: String, xLo: Long, xHi: Long,
      yCol: String, yLo: Long, yHi: Long): (Long, Long) = {
    val stats = spark.read.parquet(parquetDir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
    val total = stats.count()
    val touched = stats.filter(
      col("x_max") >= xLo && col("x_min") <= xHi &&
      col("y_max") >= yLo && col("y_min") <= yHi).count()
    (touched, total)
  }
}
