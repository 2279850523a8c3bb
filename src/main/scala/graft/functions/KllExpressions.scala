package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native KLL quantile-sketch aggregates (Karnin-Lang-Liberty 2016,
  * via the Apache DataSketches library already on Spark's classpath —
  * the same library behind Spark's own `hll_sketch_agg` family, which
  * stops at distinct counts and exposes no quantile sketch; these
  * fill that gap the way Spark's HLL functions are built:
  * [[TypedImperativeAggregate]] with the LIVE sketch as the buffer
  * object, serialized ONLY at partial-aggregation shuffle boundaries —
  * never per row. Map-side combine applies like any built-in
  * aggregate, so a corpus-sized pass produces per-partition sketches
  * that merge at the exchange: one shuffle of groups × sketch-size
  * bytes.
  *
  * Guarantee (published, probabilistic): a k=200 sketch answers any
  * rank query within ~1.65% normalized rank error with 99% confidence;
  * error shrinks as k grows. KLL compaction is RANDOMIZED (coin-flip
  * offsets), so sketch BYTES are not run-deterministic — gates
  * therefore pin realized rank error against exact recomputes
  * (the declared statistical-oracle policy the ANN recall gates use),
  * never sketch-state hashes. */
object KllSketch {
  /** Rank-error bound helper: the published ε(k) for one-sided PAC
    * (the DataSketches getNormalizedRankError formula). */
  def normalizedRankError(k: Int): Double =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)

  /** Minimal placeholder k for an EMPTY merge buffer. The merge
    * aggregate never merges INTO an empty buffer (it ADOPTS the first
    * incoming sketch instead — see KllMergeAgg), so the placeholder's
    * k never constrains accuracy; it exists only because the buffer
    * type must be a sketch. Keeping it at the legal minimum matters at
    * scale: a KLL heap sketch allocates its k-sized item array up
    * front, so a large-k empty buffer would cost ~8·k bytes PER GROUP
    * during the aggregation — half a megabyte per group at the 65535
    * maximum, which is real memory at millions of groups. */
  val PlaceholderK: Int = 8

  private[functions] def numeric(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
  }
}

/** `kll_sketch_agg(value, k)` — build a KLL doubles sketch over a
  * numeric column. Nulls are skipped; the empty group yields an empty
  * sketch (n = 0). */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {
  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a numeric column, got ${other.simpleString}")
    }
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(KllSketch.numeric(v))
    buf
  }
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg(sketch)` — merge stored sketch blobs (the store-
  * maintenance aggregate, the `hll_union_agg` analog). Null blobs are
  * skipped. */
case class KllMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {
  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a binary sketch column, got ${other.simpleString}")
    }
  // ADOPT-FIRST buffer discipline: the empty buffer is a tiny
  // placeholder that is REPLACED by the first incoming sketch (so the
  // result carries the incoming k exactly — KLL merge keeps the
  // SMALLER k, and a fixed-k neutral buffer would either degrade
  // accuracy (small k) or allocate ~8·k bytes per group (large k));
  // only non-empty buffers merge in place.
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllSketch.PlaceholderK)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val in = KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (buf.isEmpty) in else { buf.merge(in); buf }
    }
  }
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch =
    if (b.isEmpty) o else if (o.isEmpty) b else { b.merge(o); b }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(sketch, p)` — the value at normalized rank p
  * (INCLUSIVE search criterion, the library default). Empty sketch →
  * null. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (binary, double), got " +
            s"${l.simpleString}, ${r.simpleString}")
    }
  override def nullSafeEval(sk: Any, p: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(p.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(sketch)` — the EXACT item count the sketch has absorbed
  * (KLL tracks n exactly; only ranks are approximate). */
case class KllN(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a binary sketch column, got ${other.simpleString}")
    }
  override def nullSafeEval(sk: Any): Any =
    KllDoublesSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}
