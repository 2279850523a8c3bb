package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{AnnForest, AnnForestModel, DistributedAnnForest, DistributedAnnModel, PqIndex, PqModel}
import graft.operators.Dedup
import graft.sources.VecReader

/** Typed record for the vector-collection data model (SURVEY §1.4):
  * the engine is DataFrame-first internally; this facade gives users
  * compile-time field checks at the API boundary. */
case class VectorRecord(id: Long, word: String, embedding: Array[Float])

/** Typed search result: squared distance, rank 1..k per query (squared
  * — the reference's contract, sqrt is presentation, src/main.rs:91). */
case class Neighbor(query_id: Long, neighbor_id: Long, dist: Double, rank: Int)

/** Typed radius-search match — no rank: a radius result is a SET (all
  * neighbors within the threshold), not a ranked prefix. */
case class RadiusMatch(query_id: Long, neighbor_id: Long, dist: Double)

/** Typed late-interaction (MaxSim) hit: ranked doc groups per query
  * bag. */
case class MaxSimHit(query_id: Long, group_id: Long, rank: Int, maxsim: Double)

/** Typed MMR pick: greedy diversified rank with its marginal-relevance
  * score at selection time. */
case class MmrPick(rank: Int, id: Long, mmr: Double)

/** The library's typed public surface — the reference's two-function API
  * (`build_index`, `search_approximate`, src/lib.rs:81,130) plus dedup,
  * as Dataset transformations.
  */
object GraftVectors {

  /** S1: read a fastText .vec corpus. */
  def readVec(spark: SparkSession, path: String, dim: Int): Dataset[VectorRecord] = {
    import spark.implicits._
    VecReader.read(spark, path, dim).as[VectorRecord]
  }

  /** D1+D2: bit-exact first-seen-wins dedup. */
  def dedup(ds: Dataset[VectorRecord]): Dataset[VectorRecord] = {
    import ds.sparkSession.implicits._
    Dedup.exactVectors(ds.toDF(), "embedding", "id").as[VectorRecord]
  }

  /** B3: fit the forest index (seeded — reproducible, unlike the
    * reference's thread_rng). */
  def buildIndex(
      ds: Dataset[VectorRecord],
      numTrees: Int = 50, maxLeafSize: Int = 5, seed: Long = 42L): AnnForestModel =
    AnnForest(numTrees, maxLeafSize, seed).fit(ds.toDF(), "id", "embedding")

  /** Q2 batch: approximate top-k for every record in `queries`. */
  def search(
      model: AnnForestModel, queries: Dataset[VectorRecord], topK: Int): Dataset[Neighbor] = {
    import queries.sparkSession.implicits._
    model.searchBatch(
      queries.toDF().select(col("id").as("query_id"), col("embedding").as("qvec")),
      topK).as[Neighbor]
  }

  /** Q4: bulk approximate k-NN self-join. */
  def knnJoin(
      model: AnnForestModel, ds: Dataset[VectorRecord], topK: Int): Dataset[Neighbor] = {
    import ds.sparkSession.implicits._
    model.knnJoin(ds.toDF(), topK, "id", "embedding").as[Neighbor]
  }

  /** Q4 at scale: bulk k-NN self-join on the bucketed path — one
    * routing pass over the corpus, whole-leaf candidates (recall ≥ the
    * traversal's), store never broadcast. Prefer this over [[knnJoin]]
    * when the corpus is large; prefer [[knnSelfJoinDistributed]] when
    * the index itself was built distributed. */
  def knnSelfJoin(
      model: AnnForestModel, ds: Dataset[VectorRecord], topK: Int): Dataset[Neighbor] = {
    import ds.sparkSession.implicits._
    model.knnSelfJoinBucketed(ds.toDF(), topK, "id", "embedding").as[Neighbor]
  }

  /** Q4 over the distributed model's standing corpus: the bucket table
    * already is the routed corpus, so the bulk self-join pays zero
    * routing work. The query set is the fit-time dedup'd STORE — exact
    * duplicates dropped at build don't reappear as query ids (see
    * [[DistributedAnnModel.knnSelfJoin]]); use [[knnSelfJoin]] for
    * raw-frame query coverage. */
  def knnSelfJoinDistributed(
      model: DistributedAnnModel, topK: Int): Dataset[Neighbor] = {
    import model.corpusBuckets.sparkSession.implicits._
    model.knnSelfJoin(topK).as[Neighbor]
  }

  /** B3 at scale: fit the forest WITHOUT collecting the store to the
    * driver (level-synchronous build; use beyond ~10⁸ rows, where
    * [[buildIndex]]'s reference-parity collect stops fitting). */
  def buildIndexDistributed(
      ds: Dataset[VectorRecord],
      numTrees: Int = 50, maxLeafSize: Int = 5, maxDepth: Int = 16,
      seed: Long = 42L): DistributedAnnModel =
    DistributedAnnForest(numTrees, maxLeafSize, maxDepth, seed)
      .fit(ds.toDF(), "id", "embedding")

  /** Q2/Q4 against the distributed model: bucket-join k-NN.
    * `spillEps` > 0 probes both children of near-margin planes on the
    * QUERY side only — the recall knob (0.80→0.99 at eps=0.25 on the
    * fixture) that leaves the standing corpus buckets untouched. */
  def searchDistributed(
      model: DistributedAnnModel, queries: Dataset[VectorRecord],
      topK: Int, spillEps: Double = 0.0): Dataset[Neighbor] = {
    import queries.sparkSession.implicits._
    model.knnJoin(
      queries.toDF().select(col("id").as("query_id"), col("embedding").as("qvec")),
      topK, querySpillEps = spillEps).as[Neighbor]
  }

  /** Standing-store ingest: route new vectors through the model's
    * frozen planes and grow the bucket table — no rebuild. See
    * [[DistributedAnnModel.routeForStore]] for the streaming
    * (foreachBatch) form of the same operation. */
  def appendToIndex(
      model: DistributedAnnModel, ds: Dataset[VectorRecord]): DistributedAnnModel =
    model.append(ds.toDF(), "id", "embedding")

  /** Attribute-filtered k-NN ("nearest neighbors WHERE …"): the corpus
    * predicate — over VectorRecord columns — is applied before routing,
    * below the bucket exchange, so it pushes into the corpus scan and
    * non-matching rows are never routed, shuffled, or scored. Results
    * keep k rows per query (post-filtering an unfiltered top-k cannot). */
  def searchFiltered(
      model: AnnForestModel, corpus: Dataset[VectorRecord],
      queries: Dataset[VectorRecord], topK: Int,
      corpusFilter: org.apache.spark.sql.Column): Dataset[Neighbor] = {
    import corpus.sparkSession.implicits._
    model.knnJoinBucketed(
      corpus.toDF(),
      queries.toDF().select(col("id").as("query_id"), col("embedding").as("qvec")),
      topK, corpusId = "id", corpusFilter = Some(corpusFilter)).as[Neighbor]
  }

  /** Distance-threshold ("radius") search over the bucketed path: every
    * neighbor within `maxDist` SQUARED euclidean that shares a leaf with
    * the query in ≥ 1 tree. The exact (oracle) form is
    * [[graft.operators.KnnExact.radiusJoin]]. */
  def searchRadius(
      model: AnnForestModel, corpus: Dataset[VectorRecord],
      queries: Dataset[VectorRecord], maxDist: Double): Dataset[RadiusMatch] = {
    import corpus.sparkSession.implicits._
    model.radiusJoinBucketed(
      corpus.toDF(),
      queries.toDF().select(col("id").as("query_id"), col("embedding").as("qvec")),
      maxDist, corpusId = "id").as[RadiusMatch]
  }

  /** Diversified top-k (MMR): ANN stage-1 candidates from the forest
    * model, bounded greedy re-rank — the standard retrieve→diversify
    * serving composition. Exact-candidate form (full oracle, q106) is
    * [[graft.operators.Mmr.rerank]]. */
  def searchDiverse(
      model: AnnForestModel, corpus: Dataset[VectorRecord], queryId: Long,
      topK: Int, lambda: Double = 0.7, cand: Int = 50): Dataset[MmrPick] = {
    import corpus.sparkSession.implicits._
    graft.operators.Mmr.rerankAnn(model, corpus.toDF(), queryId, topK, lambda,
      cand, idCol = "id", vecCol = "embedding").as[MmrPick]
  }

  /** Standing-index delete: tombstone anti-join folded into the bucket
    * frame — lazy until `save()` (physical compaction) or `compact()`.
    * Delete→append of the same id roundtrips. */
  def removeFromIndex(
      model: DistributedAnnModel, ids: Dataset[Long]): DistributedAnnModel =
    model.remove(ids.toDF("id"), "id")

  /** Compressed-corpus path: train PQ codebooks (driver-side, bounded
    * sample) for ~32× smaller standing corpora. See [[graft.ann.PqIndex]]. */
  def trainPq(ds: Dataset[VectorRecord], m: Int = 8, seed: Long = 42L): PqModel =
    PqIndex(m, seed).fit(ds.toDF(), "embedding")

  /** Johnson–Lindenstrauss reduction of the embedding column (sparse
    * Achlioptas projection, deterministic — see
    * [[graft.functions.RandomProjection]]): the pre-step that shrinks
    * every downstream kernel and shuffle by dOut/dIn. Narrow, no
    * shuffle. */
  def project(ds: Dataset[VectorRecord], dIn: Int, dOut: Int): Dataset[VectorRecord] = {
    import ds.sparkSession.implicits._
    ds.toDF().select(col("id"), col("word"),
      graft.functions.RandomProjection.project(col("embedding"), dIn, dOut)
        .cast("array<float>").as("embedding"))
      .as[VectorRecord]
  }

  /** SemDeDup: drop all but one representative of every intra-cell
    * cosine near-dup cluster (see [[graft.operators.SemanticDedup]]).
    * Deterministic for a fixed seed. */
  def semanticDedup(ds: Dataset[VectorRecord], threshold: Double,
      nlist: Int = 16, seed: Long = 42L): Dataset[VectorRecord] = {
    import ds.sparkSession.implicits._
    graft.operators.SemanticDedup.survivors(
      ds.toDF(), "id", "embedding", threshold, nlist, seed)
      .select(col("id"), col("word"), col("embedding")).as[VectorRecord]
  }

  /** Late-interaction (ColBERT MaxSim) retrieval over multi-vector
    * groups: `group` maps each record's id to its bag (e.g. passage
    * id); queries are whole bags from `queries` likewise grouped. Exact
    * when `candPerTok == 0`; otherwise the two-stage candidate/refine
    * serving path (see [[graft.operators.MaxSim.topKRefined]]). */
  def maxSimTopK(ds: Dataset[VectorRecord], queries: Dataset[VectorRecord],
      group: org.apache.spark.sql.Column, k: Int,
      candPerTok: Int = 0): Dataset[MaxSimHit] = {
    import ds.sparkSession.implicits._
    val corpus = ds.toDF().select(group.as("gid"), col("embedding").as("vec"))
    val q = queries.toDF().select(group.as("qid"),
      col("id").as("qt"), col("embedding").as("qvec"))
    val hits =
      if (candPerTok > 0) graft.operators.MaxSim.topKRefined(corpus, q, k, candPerTok)
      else graft.operators.MaxSim.topK(corpus, q, k)
    hits.select(col("qid").as("query_id"), col("gid").as("group_id"),
      col("rank"), col("maxsim")).as[MaxSimHit]
  }

  /** Approximate k-NN over the compressed corpus with exact re-rank of
    * a `shortlist`-wide ADC candidate set. Encodes on the fly — persist
    * `pq.encode(corpus)` once for a standing corpus instead. */
  def searchPq(
      pq: PqModel, ds: Dataset[VectorRecord], queries: Dataset[VectorRecord],
      topK: Int, shortlist: Int = 100): Dataset[Neighbor] = {
    import ds.sparkSession.implicits._
    val corpus = ds.toDF().select(col("id").as("vec_id"), col("embedding"))
    val q = queries.toDF().select(col("id").as("query_id"), col("embedding").as("qvec"))
    val cand = pq.knnJoin(pq.encode(corpus).select("vec_id", "pq_code"), q, shortlist)
      .select("query_id", "neighbor_id")
    pq.refine(cand, corpus, q, topK).as[Neighbor]
  }
}
