package graft.ann

import scala.util.Random

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row


/** Hyperplane in implicit form n·x + c = 0 (reference src/hyperplane.rs:3-6). */
/** One hit of the SQL knn face — a named struct so SQL reads
  * `h.neighbor_id` / `h.dist` instead of `_1` / `_2`. */
case class KnnHit(neighbor_id: Long, dist: Double)

case class HyperPlane(coefficients: Array[Float], constant: Float) extends Serializable {
  /** Signed unnormalized margin n·x + c. Accumulates in double — the
    * reference sums f32, a documented precision divergence that only
    * moves points sitting exactly on a plane. */
  def signedMargin(v: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < coefficients.length) { acc += coefficients(i).toDouble * v(i); i += 1 }
    acc + constant
  }

  /** Sidedness: n·x + c ≥ 0 ⇒ "above"; ties go above
    * (reference src/hyperplane.rs:9-11). */
  def isAbove(v: Array[Float]): Boolean = signedMargin(v) >= 0.0

  /** ‖n‖ — divides [[signedMargin]] into a true point-to-plane
    * distance (the spill-routing criterion). Computed once per
    * executor-side object. */
  @transient lazy val norm: Double = {
    var acc = 0.0
    var i = 0
    while (i < coefficients.length) {
      acc += coefficients(i).toDouble * coefficients(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }
}

/** Binary space-partition tree ADT (reference src/tree.rs:3-14). Leaves
  * hold positions into the dedup'd store, not external ids
  * (reference src/lib.rs:90-91). */
sealed trait Node extends Serializable
final case class Inner(plane: HyperPlane, left: Node, right: Node) extends Node
final case class Leaf(rows: Array[Int]) extends Node

/** The fitted index (reference ANNIndex, src/lib.rs:15-19): a forest of
  * random-bisector trees + the dedup'd store. `ids(i)` is the external id
  * of `vectors(i)`.
  *
  * Scale shape: the *forest* (hyperplanes only, ~numTrees·(n/maxLeaf)·dim
  * floats) is broadcast — the analog of a broadcast-hash-join build side.
  * The reference also keeps the whole vector store in process RAM
  * (src/lib.rs:15-19); we hold it alongside the forest for the
  * reference-parity search path, and additionally expose
  * [[AnnForestModel.assignLeaves]] so that at 100 TB the store stays a
  * DataFrame and candidate matching becomes a co-partitioned
  * (treeId, leafId) equi-join instead of a broadcast lookup.
  */
class AnnForestModel(
    val trees: Seq[Node],
    val ids: Array[Long],
    val vectors: Array[Array[Float]],
    val metric: String = "euclidean") extends Serializable {

  /** Normalize a query when the model is cosine-metric (the store was
    * normalized at fit; dist = 2·(1−cos) on the unit sphere). */
  private[ann] def prepQuery(q: Array[Float]): Array[Float] =
    if (metric != "cosine") q else AnnForestModel.l2NormalizeJvm(q)

  /** Primitive-array form used for every search/broadcast — built once,
    * NOT serialized with the model (rebuilt cheaply where needed; the
    * broadcasts below ship the compact form directly, never `this`). */
  @transient lazy val compact: CompactIndex = CompactIndex.build(trees, ids, vectors)

  // Broadcasts are cached per model: searchBatch / assignLeaves are
  // called repeatedly against a standing model (every batch of a
  // streaming ingest, both sides of a bucketed join), and re-broadcasting
  // a multi-MB plane set per call costs more than the work it feeds at
  // small batch sizes. Invalidated if the session changes (tests spin
  // up multiple sessions).
  @transient private var fullBc: (SparkSession, Broadcast[CompactIndex]) = null
  @transient private var structBc: (SparkSession, Broadcast[CompactIndex]) = null

  private def cachedBroadcast(spark: SparkSession, structureOnly: Boolean): Broadcast[CompactIndex] =
    synchronized {
      val cur = if (structureOnly) structBc else fullBc
      if (cur != null && (cur._1 eq spark)) cur._2
      else {
        // session switched: release the stale broadcast's blocks rather
        // than waiting for GC-triggered ContextCleaner (best-effort —
        // the old session may already be stopped)
        if (cur != null) {
          try cur._2.destroy() catch { case _: Throwable => () }
        }
        val bc = spark.sparkContext.broadcast(
          if (structureOnly) compact.structureOnly else compact)
        if (structureOnly) structBc = (spark, bc) else fullBc = (spark, bc)
        bc
      }
    }

  /** Top-k ANN search for one query (reference search_approximate,
    * src/lib.rs:130-149): union candidates over trees, exact squared
    * euclidean re-rank, ascending, take k, remap to external ids.
    * Returns (id, squaredDistance) — squared, like the reference
    * (sqrt is display-only, src/main.rs:91).
    */
  def search(query: Array[Float], topK: Int): Array[(Long, Double)] =
    // NaN distances: the reference panics (src/lib.rs:142); we sort them
    // last (Double.compare total order) — documented divergence.
    compact.search(prepQuery(query), topK)

  /** Single-point radius search: all ids within `maxDist` SQUARED
    * euclidean among the query's leaf candidates (whole leaves across
    * all trees — see [[CompactIndex.searchRadius]]). Under
    * metric="cosine", maxDist = 2·(1−minCos) on the unit sphere. */
  def searchRadius(query: Array[Float], maxDist: Double): Array[(Long, Double)] =
    compact.searchRadius(prepQuery(query), maxDist)

  /** SQL face for the engine's core query (the §4.3 "revisit" item): a
    * SQL-only user reaches top-k search as a table-function-style
    * entry — `name(qvec, k)` returns ARRAY<STRUCT<neighbor_id, dist>>
    * to LATERAL VIEW (pos)explode over, and `exactName(qvec, k)` is
    * the brute sibling over the same stored rows ([[CompactIndex
    * .searchExact]] — deterministic, so q173 hash-gates the SQL face
    * against a DuckDB exact-KNN mirror while the ANN face stays
    * recall-gated, the q83 policy). Registered the q162 way: the SAME
    * model the DataFrame API serves, one source of semantics; the
    * compact index ships via the model's cached broadcast, so per-task
    * closures carry a broadcast handle, not the corpus. */
  def registerSql(spark: SparkSession, name: String = "knn",
      exactName: String = "knn_exact"): Unit = {
    val bc = cachedBroadcast(spark, structureOnly = false)
    val cosine = metric == "cosine"
    def prep(v: Seq[Float]): Array[Float] = {
      val q = v.toArray
      if (cosine) AnnForestModel.l2NormalizeJvm(q) else q
    }
    spark.udf.register(name, udf { (v: Seq[Float], k: Int) =>
      bc.value.search(prep(v), k)
        .map { case (id, d) => KnnHit(id, d) }.toIndexedSeq
    })
    spark.udf.register(exactName, udf { (v: Seq[Float], k: Int) =>
      bc.value.searchExact(prep(v), k)
        .map { case (id, d) => KnnHit(id, d) }.toIndexedSeq
    })
  }

  /** Batch ANN search, fully distributed: one task per query partition,
    * model via broadcast (no shuffle at all — the output is narrow).
    * Input: (queryIdCol LONG, vecCol ARRAY<FLOAT>). Output:
    * (query_id, neighbor_id, dist, rank).
    */
  def searchBatch(
      queries: DataFrame, topK: Int,
      queryIdCol: String = "query_id", vecCol: String = "qvec"): DataFrame = {
    val spark = queries.sparkSession
    val bc: Broadcast[CompactIndex] = cachedBroadcast(spark, structureOnly = false)
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false),
      StructField("rank", IntegerType, nullable = false)))
    val in = graft.GraftSession.widen(queries.select(
      col(queryIdCol).cast(LongType), col(vecCol).cast(ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val cosineMetric = metric == "cosine"
    in.mapPartitions { rows =>
      val index = bc.value
      rows.flatMap { r =>
        val qid = r.getLong(0)
        val q0 = r.getSeq[Float](1).toArray
        val q = if (cosineMetric) AnnForestModel.l2NormalizeJvm(q0) else q0
        index.search(q, topK).iterator.zipWithIndex.map { case ((nid, d), i) =>
          Row(qid, nid, d, i + 1)
        }
      }
    }(enc)
  }

  /** Bulk approximate k-NN self-join (reference Q4, src/main.rs:100-123):
    * every row of `df` queries the index. Self matches included, as the
    * reference does. */
  def knnJoin(df: DataFrame, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    searchBatch(
      df.select(col(idCol).as("query_id"), col(vecCol).as("qvec")), topK)

  /** 100 TB path: route every corpus vector to its (treeId, leafId)
    * bucket *distributively* (no driver collection). Queries routed the
    * same way join on the bucket key — an LSH-style co-partitioned
    * equi-join whose shuffle is on a compact int pair, never on vectors
    * crossing a broadcast boundary.
    */
  def assignLeaves(df: DataFrame, vecCol: String = "embedding",
      spillEps: Double = 0.0, maxLeavesPerTree: Int = 4): DataFrame = {
    // fail fast on the driver: a 0-leaf budget inside the routing UDF
    // would silently route every row to nothing
    require(spillEps <= 0.0 || maxLeavesPerTree >= 1,
      s"maxLeavesPerTree must be >= 1 when spilling, got $maxLeavesPerTree")
    val spark = df.sparkSession
    // Broadcast only topology+planes (compact, store stripped). Under
    // metric="cosine" the planes were fit on a NORMALIZED store and
    // n·v + c is not scale-invariant — raw vectors must be normalized
    // here too or they route to the wrong leaves.
    val bc = cachedBroadcast(spark, structureOnly = true)
    val cosineMetric = metric == "cosine"
    val leafIdUdf = udf { (v: Seq[Float]) =>
      val q0 = v.toArray
      val q = if (cosineMetric) AnnForestModel.l2NormalizeJvm(q0) else q0
      if (spillEps > 0.0) bc.value.leafPathsSpill(q, spillEps, maxLeavesPerTree).toSeq
      else bc.value.leafPaths(q).toSeq
    }
    // explode_outer, not explode: InferFiltersFromGenerate would add
    // `size(UDF(v)) > 0 AND isnotnull(UDF(v))` below a non-outer Generate,
    // and Scala UDFs get no common-subexpression elimination — the 50-tree
    // routing traversal would run 3× per row (measured). leafPaths always
    // returns one path per tree (never empty/null), so outer semantics
    // are identical and the UDF runs exactly once per row.
    df.withColumn("__buckets", leafIdUdf(col(vecCol)))
      .withColumn("__b", explode_outer(col("__buckets")))
      .select(
        df.columns.toIndexedSeq.map(col) :+
          col("__b._1").as("tree_id") :+
          col("__b._2").as("leaf_id"): _*)
  }

  /** The 100 TB k-NN join: route corpus and queries to (treeId, leafId)
    * buckets distributively, equi-join on the bucket key, union
    * candidates across trees, exact re-rank per query.
    *
    * Versus the broadcast [[knnJoin]] (reference-parity traversal): no
    * vector store on the driver or in a broadcast — the store stays a
    * DataFrame end to end, the only wide ops are (a) one shuffle of each
    * side on a compact (int, long) bucket key and (b) the per-query
    * top-k window. Candidates are whole leaves (no first-n truncation /
    * shortfall spill — those are artifacts of the reference's serial
    * traversal); recall is ≥ the traversal's for the same forest. For a
    * standing corpus, persist `assignLeaves(corpus)` bucketed by
    * (tree_id, leaf_id) and the corpus-side shuffle disappears from
    * every subsequent query batch.
    *
    * `corpusFilter` = attribute-filtered kNN ("nearest neighbors WHERE
    * lang = 'en'"), the canonical production vector-search query shape.
    * The predicate is applied to the raw corpus BEFORE routing — below
    * the bucket exchange, so Catalyst pushes it into the corpus scan
    * (asserted in PlanSpec) and non-matching rows are never routed,
    * shuffled, or scored. Pre-filtering also keeps the result size k
    * (post-filtering an unfiltered top-k would return fewer than k rows
    * under selective predicates); candidates are the filtered rows
    * sharing a leaf with the query, so recall is measured against the
    * filtered exact oracle (AnnForestSpec). For very high selectivity
    * (predicate keeps ≪ leaf-size rows), widen the forest (more trees)
    * as you would for any sparse-candidate regime.
    */
  def knnJoinBucketed(
      corpus: DataFrame, queries: DataFrame, topK: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec",
      corpusFilter: Option[Column] = None,
      querySpillEps: Double = 0.0, queryMaxLeaves: Int = 4): DataFrame =
    // union across trees + bounded-heap top-k, one exchange for the
    // whole tail (see BucketSelfJoin.dedupTopK for the partitioning
    // argument)
    BucketSelfJoin.dedupTopK(
      bucketCandidates(corpus, queries, corpusId, corpusVec, queryId, queryVec,
        corpusFilter, querySpillEps, queryMaxLeaves),
      topK)

  /** Shared route/join/score head of the bucketed top-k and radius
    * joins (mirrors DistributedAnnModel.bucketCandidates /
    * IvfModel.cellCandidates).
    *
    * `querySpillEps` > 0 enables QUERY-SIDE spill routing: queries
    * within eps of a split plane probe both children (bounded by
    * `queryMaxLeaves` leaves per tree) — the recall knob that costs
    * only extra probed buckets, never touches the corpus side, and so
    * composes with a persisted/standing corpus bucket table unchanged.
    * Any eps > 0 probes a superset of the eps = 0 buckets, so recall
    * vs the single-path walk never drops (specced); see
    * [[CompactIndex.leafPathsSpill]] for why eps-vs-eps under a leaf
    * cap is empirical rather than guaranteed. */
  private def bucketCandidates(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      corpusFilter: Option[Column],
      querySpillEps: Double = 0.0, queryMaxLeaves: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.{l2Normalize, sqEucDist}
    // carried vectors must be normalized under cosine so the re-rank
    // distance is 2·(1−cos); routing normalizes independently inside
    // assignLeaves (which must handle direct public calls too)
    def prep(c: Column) = if (metric == "cosine") l2Normalize(c) else c
    val corpusSrc = corpusFilter.map(corpus.filter).getOrElse(corpus)
    val corpusRouted = assignLeaves(
      corpusSrc.select(col(corpusId).as("neighbor_id"), prep(col(corpusVec)).as("__cvec")), "__cvec")
    val queriesRouted = assignLeaves(
      queries.select(col(queryId).as("query_id"), prep(col(queryVec)).as("__qv")), "__qv",
      spillEps = querySpillEps, maxLeavesPerTree = queryMaxLeaves)
    queriesRouted
      .join(corpusRouted, Seq("tree_id", "leaf_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        sqEucDist(col("__cvec"), col("__qv")).as("dist"))
  }

  /** Distance-threshold ("radius") join via the bucket path: the same
    * routing + (tree_id, leaf_id) equi-join as [[knnJoinBucketed]], with
    * the top-k tail replaced by a `dist ≤ maxDist` filter and a pair
    * dedup ([[BucketSelfJoin.dedupRadius]]). `maxDist` is SQUARED
    * euclidean, like every dist this engine returns (under
    * metric="cosine", dist = 2·(1−cos), so maxDist = 2·(1−minCos)).
    *
    * Approximate exactly the way top-k search is: a pair is reported
    * only if it shares a leaf in ≥ 1 tree, so recall < 1 is possible at
    * any radius — measured against [[graft.operators.KnnExact.radiusJoin]]
    * (the exact oracle) in AnnForestSpec. Scale shape is strictly
    * better than the top-k tail: the threshold filter prunes candidates
    * before the only shuffle, and there is no per-query window/heap at
    * all. `corpusFilter` composes as in [[knnJoinBucketed]]. */
  def radiusJoinBucketed(
      corpus: DataFrame, queries: DataFrame, maxDist: Double,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "qvec",
      corpusFilter: Option[Column] = None,
      querySpillEps: Double = 0.0, queryMaxLeaves: Int = 4): DataFrame =
    BucketSelfJoin.dedupRadius(
      bucketCandidates(corpus, queries, corpusId, corpusVec, queryId, queryVec,
        corpusFilter, querySpillEps, queryMaxLeaves),
      maxDist)

  /** Bulk k-NN self-join (reference Q4, src/main.rs:100-123: every corpus
    * vector is also a query) — result-identical to
    * `knnJoinBucketed(corpus, corpus, k)` but routes the store through
    * the forest ONCE. The 50-tree traversal UDF is the dominant kernel
    * of the bucketed path; the general two-sided form must run it per
    * side, while here one routed table feeds both roles: members of each
    * (tree_id, leaf_id) bucket are gathered with collect_list and all
    * ordered pairs are generated in place with two Generates — no
    * self-join, no second routing pass, and one fewer vector-bearing
    * shuffle (the bucket groupBy moves each routed row once; the join
    * formulation shuffles both sides).
    *
    * Skew note: a bucket with m members emits m² candidate rows either
    * way (join or pair-generation) — leaf size is capped at fit time, so
    * m stays ~maxLeafSize plus exact-duplicate multiplicity.
    */
  def knnSelfJoinBucketed(
      corpus: DataFrame, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      saltBlocks: Int = 1): DataFrame = {
    import graft.functions.VectorFunctions.l2Normalize
    def prep(c: org.apache.spark.sql.Column) =
      if (metric == "cosine") l2Normalize(c) else c
    val routed = assignLeaves(
      corpus.select(col(idCol).as("neighbor_id"), prep(col(vecCol)).as("__cvec")), "__cvec")
    BucketSelfJoin.pairsTopK(routed, "__cvec", topK, saltBlocks)
  }

  /** Persist the fitted model as plain parquet (portable, splittable):
    * a flattened node table + the dedup'd store. */
  def save(path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    val nodes = scala.collection.mutable.ArrayBuffer.empty[FlatNode]
    trees.zipWithIndex.foreach { case (root, ti) =>
      def walk(n: Node): Int = {
        val myId = nodes.length
        n match {
          case Leaf(rows) =>
            nodes += FlatNode(ti, myId, isLeaf = true, None, None, -1, -1, rows)
          case Inner(plane, left, right) =>
            nodes += FlatNode(ti, myId, isLeaf = false,
              Some(plane.coefficients), Some(plane.constant), -1, -1, Array.empty)
            val l = walk(left); val r = walk(right)
            nodes(myId) = nodes(myId).copy(leftId = l, rightId = r)
        }
        myId
      }
      walk(root)
    }
    nodes.toSeq.toDS().write.mode("overwrite").parquet(s"$path/nodes")
    // leaf rows index the store by POSITION — persist it explicitly,
    // parquet read order is not guaranteed
    ids.zip(vectors).zipWithIndex
      .map { case ((id, vec), pos) => (pos, id, vec) }.toSeq
      .toDF("pos", "id", "vec")
      .write.mode("overwrite").parquet(s"$path/store")
    Seq(metric).toDF("metric").write.mode("overwrite").parquet(s"$path/meta")
  }
}

/** Compact primitive-array index: the broadcast/search representation.
  *
  * The object-tree form (2M boxed `Node`s at 200k rows × 50 trees) costs
  * tens of seconds in Java serialization per broadcast and pointer-chases
  * during traversal; this layout is a handful of primitive arrays —
  * serialization is a memcpy, traversal is array indexing, and the
  * vector store is ONE flat float array (row r at offset r·dim).
  * Semantics are identical to the tree walk (first-n leaf take,
  * shortfall spill, ties above — reference src/lib.rs:105-128).
  */
final class CompactIndex(
    val roots: Array[Int],
    val left: Array[Int], val right: Array[Int],     // -1 when leaf
    val planeIdx: Array[Int],                        // inner-node plane row
    val planeCoef: Array[Float],                     // nPlanes × dim
    val planeConst: Array[Float],
    val leafOff: Array[Int], val leafLen: Array[Int],
    val leafRows: Array[Int],
    val ids: Array[Long],
    val vecs: Array[Float],                          // nRows × dim
    val dim: Int) extends Serializable {

  private def signedMargin(plane: Int, q: Array[Float]): Double = {
    var acc = 0.0
    val base = plane * dim
    var i = 0
    while (i < dim) { acc += planeCoef(base + i).toDouble * q(i); i += 1 }
    acc + planeConst(plane)
  }

  private def isAbove(plane: Int, q: Array[Float]): Boolean =
    signedMargin(plane, q) >= 0.0

  private def treeCandidates(
      q: Array[Float], n: Int, node: Int,
      out: scala.collection.mutable.HashSet[Int]): Int = {
    if (left(node) < 0) {
      val take = math.min(n, leafLen(node))
      val off = leafOff(node)
      var i = 0
      while (i < take) { out += leafRows(off + i); i += 1 }
      take
    } else {
      val above = isAbove(planeIdx(node), q)
      val main = if (above) right(node) else left(node)
      val backup = if (above) left(node) else right(node)
      val k = treeCandidates(q, n, main, out)
      if (k < n) k + treeCandidates(q, n - k, backup, out) else k
    }
  }

  /** Top-k: union candidates over trees, exact squared-euclidean
    * re-rank ascending, id tiebreak, NaN last. */
  def search(query: Array[Float], topK: Int): Array[(Long, Double)] = {
    val cand = new scala.collection.mutable.HashSet[Int]
    var t = 0
    while (t < roots.length) { treeCandidates(query, topK, roots(t), cand); t += 1 }
    val scored = cand.iterator.map { pos =>
      var acc = 0.0
      val base = pos * dim
      var i = 0
      while (i < dim) {
        val d = vecs(base + i).toDouble - query(i).toDouble
        acc += d * d
        i += 1
      }
      (ids(pos), acc)
    }.toArray
    java.util.Arrays.sort(scored, (a: (Long, Double), b: (Long, Double)) => {
      val c = java.lang.Double.compare(a._2, b._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    })
    scored.take(topK)
  }

  /** EXACT top-k by brute scan over every stored row — the SQL face's
    * hash-matchable backend and the in-model recall oracle. Same
    * scoring arithmetic and (dist, id, NaN-last) total order as
    * [[search]], so ANN-vs-exact differences are traversal-only. */
  def searchExact(query: Array[Float], topK: Int): Array[(Long, Double)] = {
    val scored = new Array[(Long, Double)](ids.length)
    var pos = 0
    while (pos < ids.length) {
      var acc = 0.0
      val base = pos * dim
      var i = 0
      while (i < dim) {
        val d = vecs(base + i).toDouble - query(i).toDouble
        acc += d * d
        i += 1
      }
      scored(pos) = (ids(pos), acc)
      pos += 1
    }
    java.util.Arrays.sort(scored, (a: (Long, Double), b: (Long, Double)) => {
      val c = java.lang.Double.compare(a._2, b._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    })
    scored.take(topK)
  }

  /** All (id, dist ≤ maxDist) among the query's leaf candidates —
    * WHOLE leaves, no first-n truncation (the first-n take and
    * shortfall spill are artifacts of the reference's top-k traversal
    * budget; a radius query has no budget to spill against).
    * Approximate like every forest path: a row outside the query's
    * leaf in every tree is missed. Ascending (dist, id). */
  def searchRadius(query: Array[Float], maxDist: Double): Array[(Long, Double)] = {
    val cand = new scala.collection.mutable.HashSet[Int]
    var t = 0
    while (t < roots.length) {
      var node = roots(t)
      while (left(node) >= 0)
        node = if (isAbove(planeIdx(node), query)) right(node) else left(node)
      val off = leafOff(node)
      var i = 0
      while (i < leafLen(node)) { cand += leafRows(off + i); i += 1 }
      t += 1
    }
    val scored = cand.iterator.map { pos =>
      var acc = 0.0
      val base = pos * dim
      var i = 0
      while (i < dim) {
        val d = vecs(base + i).toDouble - query(i).toDouble
        acc += d * d
        i += 1
      }
      (ids(pos), acc)
    }.filter(_._2 <= maxDist).toArray
    java.util.Arrays.sort(scored, (a: (Long, Double), b: (Long, Double)) => {
      val c = java.lang.Double.compare(a._2, b._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    })
    scored
  }

  /** (treeId, breadcrumb-path leaf id) per tree for one vector. */
  def leafPaths(q: Array[Float]): Array[(Int, Long)] = {
    val out = new Array[(Int, Long)](roots.length)
    var t = 0
    while (t < roots.length) {
      var node = roots(t)
      var path = 1L
      while (left(node) >= 0) {
        val above = isAbove(planeIdx(node), q)
        node = if (above) right(node) else left(node)
        path = 2 * path + (if (above) 1 else 0)
      }
      out(t) = (t, path)
      t += 1
    }
    out
  }

  /** ‖n‖ per plane — lazily computed once per executor-side index,
    * normalizes [[isAbove]]'s accumulator into a true point-to-plane
    * distance for the spill criterion. */
  @transient private lazy val planeNorms: Array[Double] = {
    val n = planeConst.length
    val out = new Array[Double](n)
    var p = 0
    while (p < n) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) { acc += planeCoef(base + i).toDouble * planeCoef(base + i); i += 1 }
      out(p) = math.sqrt(acc)
      p += 1
    }
    out
  }

  /** Spill routing (multi-probe): like [[leafPaths]], but at any inner
    * node whose plane lies within `eps` (euclidean point-to-plane
    * distance) of the vector, BOTH children are explored — the true
    * nearest neighbors of a near-boundary query are equally likely on
    * either side, which is exactly the pair the single-path walk
    * loses. Main-side-first depth-first order with at most
    * `maxLeavesPerTree` leaves emitted per tree, so the first leaf is
    * always the [[leafPaths]] leaf and cost is bounded. eps = 0 ≡
    * [[leafPaths]].
    *
    * Guarantee scope: any eps > 0 probes a SUPERSET of the eps = 0
    * leaves (the main leaf is emitted first in every tree), so recall
    * vs the single-path walk never drops. Between two positive eps
    * values under a binding leaf cap the sets are NOT nested — a larger
    * eps admits deeper spills that can consume the budget ahead of a
    * smaller eps's leaves — so eps-vs-eps improvements are empirical,
    * not a theorem. */
  def leafPathsSpill(q: Array[Float], eps: Double, maxLeavesPerTree: Int): Array[(Int, Long)] = {
    require(maxLeavesPerTree >= 1, s"maxLeavesPerTree must be >= 1, got $maxLeavesPerTree")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var t = 0
    while (t < roots.length) {
      var leaves = 0
      var stack = List((roots(t), 1L))
      while (stack.nonEmpty && leaves < maxLeavesPerTree) {
        val (node, path) = stack.head
        stack = stack.tail
        if (left(node) < 0) {
          out += ((t, path))
          leaves += 1
        } else {
          val p = planeIdx(node)
          val acc = signedMargin(p, q)
          val above = acc >= 0.0
          val main = (if (above) right(node) else left(node),
            2 * path + (if (above) 1L else 0L))
          // push backup first so the main child pops (explores) first
          if (math.abs(acc) < eps * planeNorms(p))
            stack = (if (above) left(node) else right(node),
              2 * path + (if (above) 0L else 1L)) :: stack
          stack = main :: stack
        }
      }
      t += 1
    }
    out.toArray
  }

  /** Structure-only copy (planes + topology; leaf contents AND store
    * stripped) for routing broadcasts — leafPaths walks inner nodes
    * only, so shipping leafRows (one int per corpus row per tree) would
    * bloat every routing broadcast for nothing. */
  def structureOnly: CompactIndex = new CompactIndex(
    roots, left, right, planeIdx, planeCoef, planeConst,
    Array.emptyIntArray, Array.emptyIntArray, Array.emptyIntArray,
    Array.emptyLongArray, Array.emptyFloatArray, dim)
}

object CompactIndex {
  def build(trees: Seq[Node], ids: Array[Long], vectors: Array[Array[Float]]): CompactIndex = {
    val dim = if (vectors.nonEmpty) vectors(0).length else 0
    val roots = new Array[Int](trees.length)
    import scala.collection.mutable.ArrayBuffer
    val aLeft = ArrayBuffer.empty[Int]
    val aRight = ArrayBuffer.empty[Int]
    val aPlaneIdx = ArrayBuffer.empty[Int]
    val aPlaneCoef = ArrayBuffer.empty[Float]
    val aPlaneConst = ArrayBuffer.empty[Float]
    val aLeafOff = ArrayBuffer.empty[Int]
    val aLeafLen = ArrayBuffer.empty[Int]
    val aLeafRows = ArrayBuffer.empty[Int]
    def walk2(n: Node): Int = {
      val myId = aLeft.length
      n match {
        case Leaf(rows) =>
          aLeft += -1; aRight += -1; aPlaneIdx += -1
          aLeafOff += aLeafRows.length; aLeafLen += rows.length
          aLeafRows ++= rows
        case Inner(plane, l, r) =>
          aLeft += 0; aRight += 0
          aPlaneIdx += aPlaneConst.length
          aPlaneCoef ++= plane.coefficients
          aPlaneConst += plane.constant
          aLeafOff += 0; aLeafLen += 0
          val li = walk2(l)
          val ri = walk2(r)
          aLeft(myId) = li
          aRight(myId) = ri
      }
      myId
    }
    trees.zipWithIndex.foreach { case (t, i) => roots(i) = walk2(t) }
    val flatVecs = new Array[Float](vectors.length * dim)
    var r = 0
    while (r < vectors.length) {
      System.arraycopy(vectors(r), 0, flatVecs, r * dim, dim)
      r += 1
    }
    new CompactIndex(
      roots, aLeft.toArray, aRight.toArray, aPlaneIdx.toArray,
      aPlaneCoef.toArray, aPlaneConst.toArray,
      aLeafOff.toArray, aLeafLen.toArray, aLeafRows.toArray,
      ids, flatVecs, dim)
  }
}

/** Parquet-serializable node row (see [[AnnForestModel.save]]). */
case class FlatNode(
    treeId: Int, nodeId: Int, isLeaf: Boolean,
    coeffs: Option[Array[Float]], constant: Option[Float],
    leftId: Int, rightId: Int, leafRows: Array[Int])

object AnnForestModel {
  /** JVM-side one-pass L2 normalization (zero vectors pass through). */
  private[ann] def l2NormalizeJvm(q: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < q.length) { n += q(i).toDouble * q(i); i += 1 }
    val norm = math.sqrt(n)
    if (norm == 0.0) q
    else {
      val out = new Array[Float](q.length)
      i = 0
      while (i < q.length) { out(i) = (q(i) / norm).toFloat; i += 1 }
      out
    }
  }

  /** Load a model persisted by [[AnnForestModel.save]]. */
  def load(path: String, spark: SparkSession): AnnForestModel = {
    import spark.implicits._
    val flat = spark.read.parquet(s"$path/nodes").as[FlatNode]
      .collect().groupBy(_.treeId)
    val trees = flat.keys.toSeq.sorted.map { ti =>
      val byId = flat(ti).map(n => n.nodeId -> n).toMap
      def build(id: Int): Node = {
        val n = byId(id)
        if (n.isLeaf) Leaf(n.leafRows)
        else Inner(HyperPlane(n.coeffs.get, n.constant.get), build(n.leftId), build(n.rightId))
      }
      build(flat(ti).map(_.nodeId).min)
    }
    val store = spark.read.parquet(s"$path/store")
      .select(col("pos"), col("id").cast("long"), col("vec"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getLong(1), r.getSeq[Float](2).toArray))
    // only ABSENCE of meta falls back (pre-metric saves) — a failed read
    // of an existing meta must not silently degrade cosine to euclidean
    val metric =
      if (new java.io.File(s"$path/meta").exists() ||
          path.contains("://")) // non-local FS: attempt the read
        try spark.read.parquet(s"$path/meta").head().getString(0)
        catch {
          case e: org.apache.spark.sql.AnalysisException if e.getMessage.contains("PATH_NOT_FOUND") =>
            "euclidean"
        }
      else "euclidean"
    new AnnForestModel(trees, store.map(_._1), store.map(_._2), metric)
  }
}

/** Estimator: builds the forest (reference build_index, src/lib.rs:81-103).
  *
  * MLlib-`Estimator`-shaped: `AnnForest(numTrees, maxLeafSize, seed)
  * .fit(df)`. The build collects the (dedup'd) store to the driver — the
  * reference's own memory model (its entire index is process RAM,
  * src/lib.rs:15-19) — and parallelizes across trees. Each tree gets an
  * independent seeded RNG so results are identical regardless of thread
  * scheduling (the reference uses thread_rng and is nondeterministic,
  * src/lib.rs:27 — we diverge deliberately for testability, SURVEY §2.3.6).
  * Beyond driver memory (~10⁸ rows), the documented fallback is
  * level-by-level DataFrame partitioning (SURVEY §2.1 B2); fixtures and
  * the reference's own 1M-row corpus are far below that.
  */
case class AnnForest(
    numTrees: Int = 50, maxLeafSize: Int = 5, seed: Long = 42L,
    metric: String = "euclidean") {
  require(metric == "euclidean" || metric == "cosine",
    s"metric must be euclidean|cosine, got $metric")

  /** Bisector plane of two sampled points a, b: n = b − a, passes through
    * the midpoint, c = −n·mid (reference build_hyperplane,
    * src/lib.rs:22-48; kernel arg-order quirk a.subtract_from(b) = b − a,
    * src/vector.rs:8-12). */
  private[ann] def buildHyperplane(
      idx: Array[Int], vecs: Array[Array[Float]], rng: Random): (HyperPlane, Array[Int], Array[Int]) = {
    val dim = vecs(idx(0)).length
    // sample two distinct positions (reference choose_multiple(2), src/lib.rs:26-28)
    val ai = rng.nextInt(idx.length)
    var bi = rng.nextInt(idx.length)
    var tries = 0
    while (bi == ai && tries < 8) { bi = rng.nextInt(idx.length); tries += 1 }
    val a = vecs(idx(ai)); val b = vecs(idx(math.max(0, if (bi == ai) (ai + 1) % idx.length else bi)))
    val n = new Array[Float](dim)
    var i = 0
    while (i < dim) { n(i) = b(i) - a(i); i += 1 }
    var c = 0.0
    i = 0
    while (i < dim) { c += n(i).toDouble * ((a(i).toDouble + b(i).toDouble) / 2.0); i += 1 }
    val plane = HyperPlane(n, (-c).toFloat)
    val above = Array.newBuilder[Int]
    val below = Array.newBuilder[Int]
    idx.foreach { id => if (plane.isAbove(vecs(id))) above += id else below += id }
    (plane, below.result(), above.result())
  }

  /** Recursive build (reference build_a_tree, src/lib.rs:50-62): leaf at
    * ≤ maxLeafSize; left=below, right=above. Guards the reference's
    * infinite-recursion hazard (identical/degenerate splits) with a
    * forced leaf — the reference relies on dedup alone (SURVEY §7 M3). */
  private[ann] def buildTree(
      idx: Array[Int], vecs: Array[Array[Float]], rng: Random, depth: Int = 0): Node = {
    // depth cap 62: assignLeaves encodes the root-to-leaf path as a
    // 1-sentinel + one bit per level breadcrumb in a LONG — 62 levels
    // keeps it within 63 bits (overflow would silently merge buckets)
    if (idx.length <= maxLeafSize || depth >= 62) Leaf(idx)
    else {
      val (plane, below, above) = buildHyperplane(idx, vecs, rng)
      if (below.isEmpty || above.isEmpty) Leaf(idx) // degenerate split guard
      else Inner(plane, buildTree(below, vecs, rng, depth + 1), buildTree(above, vecs, rng, depth + 1))
    }
  }

  /** Fit on (idCol LONG, vecCol ARRAY<FLOAT>). Bit-exact dedup first
    * (reference src/lib.rs:87-88, minus its drop-row-0 bug), then
    * numTrees independent trees in parallel. With metric="cosine" the
    * store is L2-normalized at ingest — searches then rank by cosine
    * (returned dist = 2·(1−cos); models normalize queries themselves).
    *
    * Driver memory is bounded by the RAW row count, duplicates
    * included: the collect happens before the dedup (one job per fit
    * instead of four). On a duplicate-heavy corpus whose deduped size
    * fits the driver but raw size doesn't, run [[Dedup.exactVectors]]
    * first — or use [[DistributedAnnForest]], the scale path. */
  def fit(df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): AnnForestModel = {
    // This path collects the store to the driver by design (reference
    // memory model) — so dedup AFTER the collect, on the driver: same
    // first-seen-wins bit-exact semantics as Dedup.exactVectors (min id
    // per raw-bits key; dedup on RAW vectors — normalizing first would
    // collapse distinct colinear vectors), without paying the groupBy +
    // semi-join + sort shuffles per fit. Beyond driver memory the
    // distributed dedup + build is DistributedAnnForest.
    val collected = df
      .select(col(idCol).cast(LongType), col(vecCol).cast(ArrayType(FloatType)))
      .collect()
    val byKey = new java.util.HashMap[java.util.List[Integer], (Long, Array[Float])]()
    collected.foreach { r =>
      val id = r.getLong(0)
      val vec = r.getSeq[Float](1).toArray
      val key = new java.util.ArrayList[Integer](vec.length)
      vec.foreach(f => key.add(java.lang.Float.floatToRawIntBits(f)))
      val prev = byKey.get(key)
      if (prev == null || id < prev._1) byKey.put(key, (id, vec))
    }
    import scala.jdk.CollectionConverters._
    val deduped = byKey.values().asScala.toArray
      .sortBy(_._1) // deterministic store order = deterministic leaves
    val ids = deduped.map(_._1)
    val raw = deduped.map(_._2)
    val vecs =
      if (metric == "cosine") raw.map(AnnForestModel.l2NormalizeJvm) else raw
    val positions = Array.range(0, vecs.length)
    import scala.collection.parallel.CollectionConverters._
    val trees = (0 until numTrees).par.map { t =>
      buildTree(positions, vecs, new Random(seed * 1000003L + t))
    }.seq
    new AnnForestModel(trees, ids, vecs, metric)
  }
}
