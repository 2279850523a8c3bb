package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — the step that
  * turns pairwise similarity into dedup decisions (keep one doc per
  * duplicate cluster).
  *
  * Spark has no native graph operator (per the brief's preference
  * order this is (a): composed from existing ops): min-label
  * propagation — every node repeatedly takes the minimum label among
  * itself and its neighbors until fixpoint. Converges in O(cluster
  * diameter) rounds; near-dup clusters are shallow (diameter ≲ 5), so
  * the loop is short. Each round is one shuffle join + one aggregation,
  * with `localCheckpoint` breaking lineage so plans don't grow
  * exponentially — the standard iterative-algorithm discipline on
  * Spark (same shape at 100 TB, with reliable checkpointing instead).
  */
object DedupClusters {

  /** edges: (id_a, id_b) undirected. Returns (node, cluster) where
    * cluster = min node id reachable — a canonical cluster label. */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(edges.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("nlabel"))
      val afterNeighbors = labels
        .join(neighborMin, Seq("node"), "left")
        .select(
          col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // pointer jumping: follow label→label-of-label, halving chain
      // lengths each round → O(log diameter) total rounds, not O(diameter)
      val updated = afterNeighbors
        .join(
          afterNeighbors.select(col("node").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(
          col("node"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = updated.as("u")
        .join(labels.select(col("node"), col("label").as("old")), Seq("node"))
        .filter(col("label") =!= col("old"))
        .count()
      labels = updated
      converged = changed == 0
      i += 1
    }
    labels.select(col("node"), col("label").as("cluster"))
  }

  /** Keep-first dedup decision from near-dup clusters: every doc with a
    * cluster label different from its own id is a duplicate to drop. */
  def survivors(allDocs: DataFrame, idCol: String, comps: DataFrame): DataFrame = {
    val dupes = comps.filter(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    allDocs.join(dupes, Seq(idCol), "left_anti")
  }

  /** Quality-aware dedup decision: keep the HIGHEST-quality member of
    * each near-dup cluster (ties → smallest id) instead of the smallest
    * id — what a curation pipeline actually wants (near-dup groups often
    * mix a clean original with truncated/boilerplated copies; keep-first
    * keeps whichever crawled first). Docs in no cluster all survive.
    *
    * Scale shape: quality joins the (node, cluster) labels on the id
    * (equi-join), then one argmax aggregation per cluster —
    * `max_by(node, (quality, -node))` is an ordinary partial-aggregable
    * agg, so the per-cluster selection map-side combines; no window, no
    * per-cluster sort. The anti-join back to the corpus is keyed on id.
    * Returns the surviving rows of `allDocs`. */
  def keepBest(allDocs: DataFrame, idCol: String, qualityCol: String,
      comps: DataFrame): DataFrame = {
    val q = allDocs.select(col(idCol).cast("long").as("node"),
      col(qualityCol).as("__q"))
    // max of (quality, -node) = best quality, then smallest id — ids are
    // non-negative so the negation cannot overflow
    val winners = comps.join(q, Seq("node"))
      .groupBy(col("cluster"))
      .agg(max_by(col("node"), struct(col("__q"), -col("node"))).as("node"))
      .select(col("node").as(idCol))
    val losers = comps.select(col("node").as(idCol))
      .join(winners, Seq(idCol), "left_anti")
    allDocs.join(losers, Seq(idCol), "left_anti")
  }

  /** Leakage-safe train/holdout split: every member of a near-dup
    * cluster lands in the SAME split — the guard against a duplicate of
    * a training document leaking into the eval set, which a per-doc
    * random split cannot give. Singleton docs (in no pair) form their
    * own cluster.
    *
    * Assignment is a deterministic integer hash of the cluster label
    * (multiplicative mod a 31-bit prime — exact in 64-bit on any
    * engine, so the split is SQL-mirrorable and hash-verifiable, unlike
    * xxhash/rand): split = 'train' iff h(cluster) % 100 < trainPct.
    * Scale shape: one left equi-join of the corpus ids against the
    * (node, cluster) labels plus narrow arithmetic — the components
    * computation (pointer jumping, O(log diameter) rounds) dominates
    * and is shared with every other cluster consumer. */
  def leakageSafeSplit(allDocs: DataFrame, idCol: String,
      comps: DataFrame, trainPct: Int = 80): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct out of range: $trainPct")
    val assigned = allDocs.select(col(idCol))
      .join(comps.select(col("node").as(idCol), col("cluster")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster"), col(idCol).cast("long")).as("cluster"))
    val h = pmod(pmod(col("cluster"), lit(1000000007L)) * lit(1000003L),
      lit(1000000007L))
    assigned.withColumn("split",
      when(pmod(h, lit(100)) < trainPct, lit("train")).otherwise(lit("holdout")))
  }
}
