package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann.IvfIndex
import graft.functions.VectorFunctions.cosine

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with a k-means coarse
  * quantizer, generate cosine-similarity pairs only WITHIN each
  * cluster, connect them into components, and keep one representative
  * (min id) per component. The cluster blocking turns the quadratic
  * all-pairs comparison into Σ(cell size)² — the same cost bound as
  * every bucketed join in this engine — at the price of missing
  * near-dup pairs that straddle a cell boundary (the paper's own
  * trade; raise `nlist` recall by probing neighbor cells via
  * IvfModel.assignCells(n > 1) at 2× pair cost).
  *
  * Composition of already-verified pieces: [[IvfIndex]] (seeded
  * driver-side quantizer, broadcast centroids, narrow cell
  * assignment), cell-blocked cosine pairs (one shuffle on the INT cell
  * id), [[DedupClusters.components]] (min-label propagation),
  * [[DedupClusters.survivors]] (anti-join). Deterministic for a fixed
  * seed, so specs pin exact outputs.
  */
object SemanticDedup {

  /** Near-dup pairs within quantizer cells: (id_a, id_b, cos), id_a < id_b. */
  def cellPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, seed: Long = 42L): DataFrame = {
    val model = IvfIndex(nlist = nlist, nprobe = 1, seed = seed).fit(df, vecCol)
    val cells = model.assignCells(df.select(col(idCol), col(vecCol)), vecCol, 1)
    val a = cells.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = cells.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Rows of `df` that survive semantic dedup (one representative —
    * the min id — per intra-cell near-dup component). */
  def survivors(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, seed: Long = 42L): DataFrame = {
    val pairs = cellPairs(df, idCol, vecCol, threshold, nlist, seed)
    DedupClusters.survivors(df, idCol, DedupClusters.components(pairs))
  }
}
