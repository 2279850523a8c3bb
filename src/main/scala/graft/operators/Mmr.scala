package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
  * the standard "diverse top-k" serving operator — greedily pick the
  * candidate maximizing
  *
  *   mmr(d) = lambda * rel(d) - (1 - lambda) * max_{s in S} sim(d, s)
  *
  * where S is the already-selected set (empty-set penalty = 0, so the
  * first pick is the most relevant candidate). Ties break on id.
  *
  * Scale shape: the corpus-sized work is the candidate stage — cosine
  * relevance against the broadcast query and a heap-pruned top-`cand`
  * (TakeOrderedAndProject; the corpus is never sorted or windowed).
  * The greedy selection is inherently sequential (pick i depends on
  * picks 1..i-1) but only within one query: the single-query paths run
  * it on the driver over the `cand` collected candidate vectors — a
  * BOUNDED serving-sized set (O(cand * dim), independent of corpus
  * size) — while the batch path distributes it per query via
  * `groupByKey(qid).flatMapGroups`, so batch scale is executor-bounded,
  * not driver-bounded. Re-ranking k of `cand` is exactly what every
  * production MMR layer does after ANN retrieval.
  */
object Mmr {

  /** Greedy MMR over an in-memory candidate set.
    * cands: (id, rel, vec) sorted or not; returns (rank, id, mmr). */
  def rerankLocal(
      cands: Seq[(Long, Double, Array[Float])],
      k: Int, lambda: Double): Seq[(Int, Long, Double)] = {
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.sortBy(c => (-c._2, c._1)).map(c => c._1 -> c): _*)
    while (picked.size < k && remaining.nonEmpty) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.valuesIterator.foreach { case (id, rel, vec) =>
        val penalty =
          if (selVecs.isEmpty) 0.0
          else selVecs.iterator.map(sv => cosineLocal(vec, sv)).max
        val score = lambda * rel - (1.0 - lambda) * penalty
        // strict > keeps the smallest id on ties (iteration is id-stable
        // within equal (rel, id) sort order)
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestScore = score; bestId = id
        }
      }
      val (_, _, bestVec) = remaining.remove(bestId).get
      selVecs += bestVec
      picked += ((picked.size + 1, bestId, bestScore))
    }
    picked.toSeq
  }

  /** Double-precision cosine, same accumulation order as the engine's
    * native CosineSimilarity kernel (i = 0..n-1 running sums) so the
    * driver-side greedy agrees bit-for-bit with in-plan scoring. */
  private[operators] def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** End-to-end serving path: heap-pruned top-`cand` cosine candidates
    * (distributed), greedy MMR re-rank (driver, bounded). Returns
    * (rank, idCol, mmr) with mmr rounded to `scale` for hash-stable
    * comparison. */
  def rerank(
      corpus: DataFrame, queryId: Long, k: Int,
      lambda: Double = 0.7, cand: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Int = 6): DataFrame = {
    val q = corpus.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    val scored = corpus.crossJoin(broadcast(q))
      .select(col(idCol),
        graft.functions.VectorFunctions.cosine(col(vecCol), col("__qvec")).as("rel"),
        col(vecCol).as("__vec"))
      .orderBy(col("rel").desc, col(idCol))
      .limit(cand)
    greedyToDf(scored, k, lambda, idCol, scale)
  }

  /** MMR after ANN retrieval — the production serving composition:
    * stage 1 is the forest model's candidate search (distributed,
    * standing-index-shaped), stage 2 the same bounded greedy. Candidate
    * quality is the model's recall; given identical candidate SETS the
    * picks equal [[rerank]]'s (specced). */
  def rerankAnn(
      model: graft.ann.AnnForestModel, corpus: DataFrame, queryId: Long,
      k: Int, lambda: Double = 0.7, cand: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Int = 6): DataFrame = {
    val q = corpus.filter(col(idCol) === queryId)
      .select(lit(queryId).as("query_id"), col(vecCol).as("qvec"))
    val hits = model.searchBatch(q, cand).select(col("neighbor_id"))
    val scored = corpus
      .join(hits, col(idCol) === col("neighbor_id"))
      .crossJoin(broadcast(q.select(col("qvec"))))
      .select(col(idCol),
        graft.functions.VectorFunctions.cosine(col(vecCol), col("qvec")).as("rel"),
        col(vecCol).as("__vec"))
    greedyToDf(scored, k, lambda, idCol, scale)
  }

  /** Batch MMR — many queries diversified in ONE plan (the q80/q100
    * batch-serving shape): the corpus-sized stage is a broadcast of the
    * query bag + per-query heap-pruned top-`cand` (TopKPerKey: bounded
    * heaps before the shuffle, never a per-partition sort). The greedy
    * is per-query independent, so each query's cand-bounded candidate
    * slice runs [[rerankLocal]] inside `groupByKey(qid).flatMapGroups`
    * ON EXECUTORS — candidate vectors never reach the driver and driver
    * memory is flat in |queries| (a 1M-query batch at cand=50 is ~60 GB
    * of candidate vectors; collecting that was the one serving-path
    * scale killer left in round 6). Per-group state is one cand-sized
    * buffer. Returns (qid, rank, idName, mmr). */
  def rerankBatch(
      corpus: DataFrame, queries: DataFrame, k: Int,
      lambda: Double = 0.7, cand: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryId: String = "qid", queryVec: String = "qvec",
      scale: Int = 6): DataFrame = {
    // Heap rows are SLIM (qid, id, rel) — no vectors: TopKPerKey's
    // partial phase keeps one cand-bounded heap per query PER MAP
    // PARTITION, so carrying vectors costs |queries|·cand·dim floats
    // per partition (a 100k-query bag × 20 cand × 64-dim OOMed a local
    // executor; 1M × 50 × 300-dim would be ~60 GB per partition).
    // Slim rows make that |queries|·cand·24B; the survivors' vectors
    // are re-joined afterwards — |queries|·cand rows against the
    // corpus, an equi-join on the id (co-located when the corpus is a
    // bucketed standing table), instead of vectors riding every heap.
    val scored = graft.GraftSession.widen(corpus).crossJoin(broadcast(queries))
      .select(col(queryId), col(idCol),
        graft.functions.VectorFunctions.cosine(col(vecCol), col(queryVec)).as("rel"))
      .withColumn("__nrel", -col("rel"))
    val pruned = graft.plans.TopKPerKey.perKey(
      scored, Seq(queryId), Seq("__nrel", idCol), cand)
    val withVecs = pruned.join(
      corpus.select(col(idCol), col(vecCol).as("__vec")), Seq(idCol))
    greedyPerQuery(withVecs, queryId, idCol, k, lambda, scale)
  }

  /** Batch MMR served from an ANN index — the production batch
    * composition (the batch analog of [[rerankAnn]]): stage 1 is the
    * forest's candidate search for the WHOLE query bag in one plan
    * (standing-index-shaped, per-query ≤ cand hits), stage 2 the same
    * executor-distributed per-query greedy as [[rerankBatch]]. Given
    * identical candidate SETS the picks equal the brute batch's
    * (specced); candidate quality is the model's recall. */
  def rerankBatchAnn(
      model: graft.ann.AnnForestModel, corpus: DataFrame, queries: DataFrame,
      k: Int, lambda: Double = 0.7, cand: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryId: String = "qid", queryVec: String = "qvec",
      scale: Int = 6): DataFrame = {
    val q = queries.select(
      col(queryId).cast(LongType).as("query_id"), col(queryVec).as("__bqvec"))
    val hits = model.searchBatch(
        q.select(col("query_id"), col("__bqvec").as("qvec")), cand)
      .select(col("query_id"), col("neighbor_id"))
    val scored = corpus
      .join(hits, col(idCol) === col("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id").as(queryId), col(idCol),
        graft.functions.VectorFunctions.cosine(col(vecCol), col("__bqvec")).as("rel"),
        col(vecCol).as("__vec"))
    greedyPerQuery(scored, queryId, idCol, k, lambda, scale)
  }

  /** Executor-side per-query greedy over a per-query-bounded candidate
    * frame with columns (queryId, idCol, rel, __vec). Name-resolved,
    * type-normalized projection: callers with Int id / query-id columns
    * work, and a column reorder upstream (e.g. in TopKPerKey's
    * passthrough) cannot silently mis-map fields. */
  private def greedyPerQuery(candFrame: DataFrame, queryId: String,
      idCol: String, k: Int, lambda: Double, scale: Int): DataFrame = {
    val spark = candFrame.sparkSession
    import spark.implicits._
    val slim = candFrame.select(
        col(queryId).cast(LongType), col(idCol).cast(LongType),
        col("rel").cast(DoubleType), col("__vec"))
      .as[(Long, Long, Double, Array[Float])]
    val lam = lambda; val kk = k; val sc = scale // stable locals for the closure
    slim.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        val cands = it.map(t => (t._2, t._3, t._4)).toSeq
        rerankLocal(cands, kk, lam).iterator.map { case (rank, id, score) =>
          (qid, rank, id,
            BigDecimal(score).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF(queryId, "rank", idCol, "mmr")
  }

  /** Shared tail for the SINGLE-query paths: collect the bounded
    * (id, rel, vec) candidate frame (O(cand·dim), corpus-independent),
    * run the greedy, return (rank, idName, mmr). Fields are resolved by
    * NAME, not position, so an upstream column reorder or an Int id
    * column fails loudly at analysis instead of mis-mapping at runtime;
    * the batch path ([[rerankBatch]]) never collects at all. */
  private def greedyToDf(
      scored: DataFrame, k: Int, lambda: Double,
      idName: String, scale: Int): DataFrame = {
    val spark = scored.sparkSession
    val named = scored.select(
      col(idName).cast(LongType).as("__id"),
      col("rel").cast(DoubleType).as("__rel"),
      col("__vec"))
    val local = named.collect().map { r =>
      (r.getAs[Long]("__id"), r.getAs[Double]("__rel"),
        r.getAs[scala.collection.Seq[Float]]("__vec").toArray)
    }.toSeq
    val rows = rerankLocal(local, k, lambda).map { case (rank, id, score) =>
      Row(rank, id, BigDecimal(score).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField(idName, LongType, nullable = false),
        StructField("mmr", DoubleType, nullable = false))))
  }
}
