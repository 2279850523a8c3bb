package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sparse random projection (Achlioptas 2003, "Database-friendly random
  * projections"): project dim-dIn float vectors to dOut dimensions with
  * a deterministic {+1, 0, −1} matrix — entries +1 / −1 with
  * probability 1/6 each, 0 with probability 2/3 — scaled by
  * √(3/dOut) so squared norms (and pairwise squared distances) are
  * preserved in expectation (Johnson–Lindenstrauss). The 2/3 sparsity
  * means the kernel touches a third of the components per output lane.
  *
  * The matrix is a pure integer function of (row, col) — an LCG over
  * the flattened index, high bits taken before the mod-6 (LCG low bits
  * alternate and would stripe the signs) — so every executor, every
  * retry, and the DuckDB oracle regenerate the identical matrix from
  * the index arithmetic alone: nothing is shipped, nothing is random
  * at runtime, results are reproducible at any parallelism.
  *
  * Scale shape: one narrow codegen'd map over the vectors (dOut·dIn/3
  * fused multiply-adds per row, matrix hoisted per-executor via the
  * closure); no shuffle, no driver state beyond the dOut·dIn byte
  * matrix (e.g. 64×1024 = 64 KB). The standard pre-step before
  * brute-force / IVF / PQ search when the raw dimension is the cost
  * driver — compose as project → AnnForest/IvfIndex/PqIndex fit on
  * the reduced vectors.
  */
object RandomProjection {

  /** Deterministic Achlioptas sign at flattened index (k·dIn + j).
    * floorMod keeps the chain well-defined over the whole Long domain:
    * past idx ≈ 8.4e9 the multiply wraps and a plain `%` would go
    * negative, collapsing almost every entry to the `case _ => 0` arm
    * and silently degrading the projection. Wrapped indices still see a
    * deterministic, well-mixed value (identical to the unwrapped LCG for
    * every idx below the wrap point, i.e. any realistic dOut·dIn). */
  def signAt(idx: Long): Int = {
    val r = Math.floorMod(1103515245L * idx + 12345L, 2147483648L)
    (Math.floorMod(r >> 16, 6L) match {
      case 0L => 1
      case 1L => -1
      case _ => 0
    })
  }

  /** The dOut × dIn sign matrix (bytes; 0 = skip). */
  def signMatrix(dOut: Int, dIn: Int): Array[Array[Byte]] =
    Array.tabulate(dOut, dIn)((k, j) => signAt(k.toLong * dIn + j).toByte)

  /** Projected vector as ARRAY<DOUBLE>: y[k] = √(3/dOut) · Σ_j s(k,j)·v[j].
    * Component sums run in j order with a double accumulator, so the
    * value is bit-identical wherever the row is computed. */
  def project(vec: Column, dIn: Int, dOut: Int): Column = {
    val m = signMatrix(dOut, dIn)
    val scale = math.sqrt(3.0 / dOut)
    val f = udf { (v: Seq[Float]) =>
      if (v == null) null // null embedding → null projection (SQL-like)
      else {
        val arr = v.toArray
        val n = math.min(arr.length, dIn)
        Array.tabulate(dOut) { k =>
          val row = m(k)
          var acc = 0.0
          var j = 0
          while (j < n) {
            val s = row(j)
            if (s != 0) acc += s * arr(j).toDouble
            j += 1
          }
          acc * scale
        }.toSeq
      }
    }
    f(vec)
  }
}
