package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native HILBERT-curve index kernels — the scalar face of the layout
  * curves ([[graft.operators.ZOrder]]).
  *
  * Why a native expression and not a Column composition: the Hilbert
  * recurrence carries (x, y, d) state across `bits` rounds where x
  * feeds both next-x and next-y, so a single Column expression tree
  * DOUBLES per round (2^bits nodes) — the exact blowup
  * `ZOrder.withHilbert` documents and sidesteps with per-round
  * projections. A DataFrame transform cannot be a SQL scalar, though,
  * so the SQL face (`hilbert_d`, `hilbert_d3`) gets the recurrence as
  * an imperative loop in a codegen'd expression instead: O(bits) work
  * per row, one static call inside whole-stage codegen, zero plan
  * growth. The same kernel backs both eval and doGenCode, so the
  * interpreted and generated paths cannot diverge.
  *
  * 2-D is the classic per-bit reflect-rotate xy→d recurrence (Hilbert
  * 1891, the formulation `withHilbert` runs round-for-round —
  * HilbertExprSpec pins expression ≡ withHilbert on a full grid, and
  * q243 shares q233's generated DuckDB oracle verbatim). 3-D (and the
  * general n-D form) is the Skilling transform ("Programming the
  * Hilbert curve", Skilling 2004): inverse-undo + Gray encode into the
  * transposed representation, then a stride-n Morton interleave of the
  * transposed words. Both are EXACT space-filling curves — bijective
  * on the full grid with Manhattan-adjacent consecutive cells (specced
  * by walking complete grids), which is the property the layout's
  * bounding-box tightness derives from.
  *
  * Domain contract (same as withHilbert / mortonCode2's checked raw
  * domain): inputs must lie in [0, 2^bits); out-of-range fails loud —
  * a silently aliased cell 2^bits away would corrupt the layout's
  * adjacency with no visible error. Compose with [[graft.operators
  * .ZOrder.bucket]] for wide domains. */
object HilbertCurve {

  private def checkDomain(v: Long, bits: Int, what: String): Unit =
    if (v < 0 || v >= (1L << bits))
      throw new IllegalArgumentException(
        s"hilbert_d: $what=$v outside [0, ${1L << bits}) for bits=$bits; " +
          "bucket the dimension first")

  /** Classic 2-D xy→d — bit-identical to `ZOrder.withHilbert`. */
  def index2(x0: Long, y0: Long, bits: Int): Long = {
    checkDomain(x0, bits, "x"); checkDomain(y0, bits, "y")
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // reflect (rx=1) then swap
        val nx = if (rx == 1) s - 1 - y else y
        val ny = if (rx == 1) s - 1 - x else x
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }

  /** 3-D xyz→d via the Skilling transform: inverse-undo + Gray encode
    * give the transposed index; the stride-3 dilation interleaves it
    * (bit q of word i lands at index bit 3q + (2 − i) — word 0 holds
    * the most significant bit of each 3-bit group). bits ≤ 20 keeps
    * the 3·bits-bit index in a non-negative Long. */
  def index3(x0: Long, y0: Long, z0: Long, bits: Int): Long = {
    checkDomain(x0, bits, "x"); checkDomain(y0, bits, "y")
    checkDomain(z0, bits, "z")
    val xs = Array(x0, y0, z0)
    val m = 1L << (bits - 1)
    // inverse undo excess work
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((xs(i) & q) != 0) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    xs(1) ^= xs(0); xs(2) ^= xs(1)
    var t = 0L
    q = m
    while (q > 1) { if ((xs(2) & q) != 0) t ^= q - 1; q >>= 1 }
    xs(0) ^= t; xs(1) ^= t; xs(2) ^= t
    (dilate3(xs(0)) << 2) | (dilate3(xs(1)) << 1) | dilate3(xs(2))
  }

  /** Stride-3 bit dilation — the `ZOrder.spread3` mask cascade as a
    * scalar (bit q → bit 3q; low 21 bits). */
  def dilate3(v0: Long): Long = {
    var v = v0 & 2097151L
    v = (v | (v << 32)) & 8725724278095871L
    v = (v | (v << 16)) & 8725728556220671L
    v = (v | (v << 8)) & 1157144660301377551L
    v = (v | (v << 4)) & 1207822528635744451L
    v = (v | (v << 2)) & 1317624576693539401L
    v
  }
}

/** `hilbert_d(x, y, bits)` — the 2-D Hilbert index as a codegen'd
  * scalar. `bits` is plan-shape (a registration-time literal), not a
  * child. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
  override def prettyName: String = "hilbert_d"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(e.dataType))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two integral coordinates, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  private def longOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.index2(longOf(a), longOf(b), bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertCurve.index2((long) $a, (long) $b, $bits);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

/** `hilbert_d3(x, y, z, bits)` — the 3-D (Skilling) Hilbert index. */
case class HilbertIndex3(first: Expression, second: Expression,
    third: Expression, bits: Int) extends TernaryExpression {
  require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
  override def prettyName: String = "hilbert_d3"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(first, second, third).forall(e => Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(e.dataType))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects three integral coordinates")
  }
  private def longOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    HilbertCurve.index3(longOf(a), longOf(b), longOf(c), bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.HilbertCurve.index3((long) $a, (long) $b, (long) $c, $bits);")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndex3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
