package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as Catalyst column expressions.
  *
  * The reference's kernels (dot, squared-euclidean, midpoint — reference
  * src/vector.rs:8-36) become higher-order-function compositions
  * (`zip_with` + `aggregate`), which stay inside whole-stage codegen — no
  * UDF serialization, no Python boundary, and Catalyst can push the
  * surrounding filter/project to the parquet scan.
  *
  * Accumulation is DOUBLE for numeric stability and to match what the
  * DuckDB oracle computes; inputs are ARRAY<FLOAT> (f32 parity with the
  * reference's `[f32; N]`).
  */
object VectorFunctions {

  import org.apache.spark.sql.GraftBridge

  private def toFloatArr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftBridge.expression(c.cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType)))

  /** dot(a, b) = Σ aᵢ·bᵢ (reference src/vector.rs:20-23). Codegen'd
    * native expression — fuses into whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(toFloatArr(a), toFloatArr(b)))

  /** Squared euclidean distance Σ (aᵢ−bᵢ)² (reference src/vector.rs:33-36;
    * squared — sqrt is display-only, src/main.rs:91). Codegen'd. */
  def sqEucDist(a: Column, b: Column): Column =
    GraftBridge.column(SqEucDistance(toFloatArr(a), toFloatArr(b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. One-pass
    * codegen'd kernel. */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(toFloatArr(a), toFloatArr(b)))

  /** L2-normalize an ARRAY<FLOAT> column (zero vectors pass through).
    * On the unit sphere, squared euclidean = 2·(1−cosine) — monotonic
    * in cosine, which is how the ANN forest supports metric="cosine"
    * without touching its euclidean internals. Single-pass native
    * expression (see [[L2Normalize]]). */
  def l2Normalize(a: Column): Column =
    GraftBridge.column(L2Normalize(toFloatArr(a)))

  /** v1 HOF composition of sqEucDist, kept as a cross-check for the
    * native expression (identical accumulation order/precision). */
  def sqEucDistHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0d),
      (acc, v) => acc + v)

  /** Bit-exact dedup key (reference src/vector.rs:25-31, D1): each f32
    * reinterpreted as its IEEE-754 bits, packed into one BINARY value.
    * Distinguishes -0.0 from 0.0 and NaN payloads — Spark's native
    * grouping equality normalizes both, so `dropDuplicates("embedding")`
    * would NOT reproduce the reference's semantics.
    *
    * A single BINARY key also makes the dedup shuffle cheap: one
    * fixed-width byte array per row instead of an ARRAY<INT> group key.
    */
  val floatBitsKeyUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Float]) =>
      if (a == null) null
      else {
        val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        // raw bits: floatToIntBits would canonicalize NaN payloads; the
        // reference's f32::to_bits does not (src/vector.rs:28)
        a.foreach(f => bb.putInt(java.lang.Float.floatToRawIntBits(f)))
        bb.array()
      }
    }

  def floatBitsKey(a: Column): Column = floatBitsKeyUdf(a)

  /** Per-component IEEE-754 bits as ARRAY<INT> (the reference's
    * HashKey<N> shape, for tests / inspection). */
  val floatBitsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Float]) =>
      if (a == null) null else a.map(java.lang.Float.floatToRawIntBits)
    }

  def floatBits(a: Column): Column = floatBitsUdf(a)

  // ---- 1-bit (binary) quantization (the 32× compression path) ----

  /** Sign-bit pack an ARRAY<FLOAT> into ARRAY<BIGINT> words (bit set ⇔
    * element < 0); see [[SignPack]]. The encode step of the two-stage
    * Hamming-scan → exact-rerank serving path
    * ([[graft.operators.BinaryQuant]]). */
  def signPack(a: Column): Column =
    GraftBridge.column(SignPack(toFloatArr(a)))

  /** Popcount Hamming between two [[signPack]] codes — one XOR+POPCNT
    * per 64 dims, whole-stage codegen'd ([[HammingPacked]]). */
  def hammingPacked(a: Column, b: Column): Column =
    GraftBridge.column(HammingPacked(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Asymmetric 1-bit score — full-precision query × sign-reconstructed
    * ±1 document ([[AsymmetricBqDot]]); larger = more similar. Beats
    * symmetric Hamming recall at the same oversample. */
  def bqAsymDot(query: Column, code: Column): Column =
    GraftBridge.column(AsymmetricBqDot(
      toFloatArr(query), GraftBridge.expression(code)))

  // ---- int8 scalar quantization (the 4× compression path) ----
  //
  // Symmetric per-vector linear quantization: scale = max|xᵢ|/127,
  // codeᵢ = round(xᵢ/scale) ∈ [-127, 127]. The trivial-decode
  // complement to PQ ([[graft.ann.PqIndex]]): 4× instead of ~32×, but
  // decode is one multiply and dot products can run directly on int8
  // codes (a·b ≈ scaleₐ·scale_b·Σcodeᵃᵢcodeᵇᵢ). Pure Catalyst column
  // compositions (all arithmetic in DOUBLE so the DuckDB oracle can
  // mirror it term for term); everything is narrow — at 100 TB the
  // encode is a write-once projection, like PQ's.

  /** Quantization step: max|xᵢ|/127 as DOUBLE (0 for the zero vector). */
  def sq8Scale(a: Column): Column =
    array_max(transform(a, x => abs(x.cast("double")))) / lit(127.0)

  /** int8 codes (as ARRAY<BIGINT> for lossless SQL mirroring;
    * `scale` must be [[sq8Scale]] of the same column). */
  def sq8Codes(a: Column, scale: Column): Column =
    transform(a, x => round(x.cast("double") / scale).cast("long"))

  /** Dequantized vector (ARRAY<DOUBLE>). */
  def sq8Decode(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)
}
