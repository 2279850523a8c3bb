package graft.api

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Chunking, Curriculum, DedupClusters, Drift, EpochShuffle, NbClassifier, TextAnalysis, TextDedup, UnigramLm, WeightedSample}

/** Typed document record for the curation surface (mirrors the fixture
  * `documents` schema — FIXTURES.md). */
case class Document(doc_id: Long, text: String, lang: String,
  source: String, n_chars: Long)

/** Typed near-duplicate pair. `score`'s POLARITY depends on the
  * producer: [[GraftCuration.nearDupPairs]] fills it with Jaccard
  * similarity (HIGHER = more duplicate), [[GraftCuration.simhashPairs]]
  * with Hamming distance (LOWER = more duplicate) — sort accordingly. */
case class NearDupPair(id_a: Long, id_b: Long, score: Double)

/** Typed LM-quality score row. */
case class LmScore(doc_id: Long, n: Long, logprob_avg: Double)

/** Typed split assignment (leakage-safe: cluster-atomic). */
case class SplitAssignment(doc_id: Long, cluster: Long, split: String)

/** Typed per-slice drift row (plug-in KL vs the corpus mix). */
case class SliceDrift(slice: String, n_tokens: Long, vocab: Long, kl: Double)

/** Typed tokenizer-billed vs whitespace token counts. */
case class TokenBill(doc_id: Long, n_words: Int, n_bpe: Long)
case class TokenizedDoc(doc_id: Long, token_ids: Seq[Long])
case class TokenChunk(doc_id: Long, chunk_idx: Long, token_ids: Seq[Long])

/** Typed classifier score row (s1/s0 = class log-likelihoods, 6dp). */
case class ClassifierScore(doc_id: Long, s1: Double, s0: Double, pred: Int)

/** Typed snapshot-diff row (status ∈ added|removed|changed|unchanged). */
case class DiffStatus(doc_id: Long, status: String)

/** Typed contrastive training triplet (neg_clean = 0 when the draw
  * landed inside the anchor's near-dup cluster — drop or redraw). */
case class Triplet(anchor_id: Long, pos_id: Long, neg_id: Long, neg_clean: Int)

/** Typed DSIR selection row (log_w = 6dp log importance weight). */
case class DsirPick(doc_id: Long, log_w: Double)

/** Typed curriculum slot (phase 1 = easiest; rank is the reproducible
  * read order within the phase). */
case class CurriculumSlot(phase: Int, rank_in_phase: Int, doc_id: Long,
  n_tok: Long, difficulty: Double)

/** Typed epoch-schedule slot (position 1..n within each epoch;
  * resume = a (epoch, position) filter, never a replay). */
case class EpochSlot(epoch: Int, position: Long, doc_id: Long)

/** Trigram stupid-backoff score; tri_frac = fraction of positions the
  * trigram tier resolved (the in-distribution diagnostic). */
case class BackoffScore(doc_id: Long, n: Long, tri_frac: Double,
    logprob_avg: Double)

/** One sliding-window chunk of a document. */
case class TextChunk(doc_id: Long, chunk_id: Int, n_tokens: Int,
    chunk: String)

/** Multiclass NB argmax prediction. */
case class DomainPrediction(doc_id: Long, pred: String, score: Double)

/** Typed compile-checked face of the text-curation suite — the
  * document-side sibling of [[GraftVectors]]: the engine stays
  * DataFrame-first internally, and this boundary gives pipeline code
  * field-name safety over the most common document operations. Every
  * method delegates to the specced operator (no second code path). */
object GraftCuration {

  /** MinHash+LSH near-dup candidate pairs, exact-Jaccard verified
    * (TextDedup.minhashPairs — the q30 path). `score` = Jaccard
    * similarity: higher = closer. */
  def nearDupPairs(docs: Dataset[Document], threshold: Double = 0.5,
      ngram: Int = 3): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    TextDedup.minhashPairs(docs.toDF(), "doc_id", "text", ngram,
        numHashes = 32, bands = 8, threshold = threshold)
      .select(col("id_a"), col("id_b"), col("jac").as("score"))
      .as[NearDupPair]
  }

  /** Banded exact SimHash pairs within a Hamming radius (the q31
    * path — output equals brute force, specced). `score` = Hamming
    * distance: LOWER = closer (opposite polarity to
    * [[nearDupPairs]]). */
  def simhashPairs(docs: Dataset[Document], maxHamming: Int = 8,
      ngram: Int = 2): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    TextDedup.simhashPairsBanded(docs.toDF(), "doc_id", "text", ngram, maxHamming)
      .select(col("id_a"), col("id_b"), col("ham").cast("double").as("score"))
      .as[NearDupPair]
  }

  /** Unigram LM quality score, self- or reference-trained (q73). */
  def lmScore(docs: Dataset[Document],
      reference: Option[Dataset[Document]] = None): Dataset[LmScore] = {
    import docs.sparkSession.implicits._
    UnigramLm.scoreAgainst(docs.toDF(), reference.getOrElse(docs).toDF())
      .select(col("doc_id"), col("n_tokens").as("n"), col("logprob_avg"))
      .as[LmScore]
  }

  /** Interpolated bigram LM score — word-order sensitive (q97). */
  def bigramScore(docs: Dataset[Document],
      reference: Option[Dataset[Document]] = None): Dataset[LmScore] = {
    import docs.sparkSession.implicits._
    UnigramLm.bigramScoreAgainst(docs.toDF(), reference.getOrElse(docs).toDF())
      .select(col("doc_id"), col("n_bigrams").as("n"), col("logprob_avg"))
      .as[LmScore]
  }

  /** Length-weighted sample without replacement per group (q101):
    * `groupBy` a Document field name, weight = n_chars. */
  def weightedSample(docs: Dataset[Document], groupBy: String,
      k: Int): Dataset[Document] = {
    import docs.sparkSession.implicits._
    WeightedSample.perKey(docs.toDF(), groupBy, "doc_id", "n_chars", k)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .as[Document]
  }

  /** Quality floor: keep docs at or above the per-group percentile of a
    * numeric field (q94's stratified floor). */
  def qualityFloor(docs: Dataset[Document], groupBy: String,
      p: Double): Dataset[Document] = {
    import docs.sparkSession.implicits._
    TextAnalysis.percentileFloor(docs.toDF(), groupBy, "n_chars", p)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .as[Document]
  }

  /** Leakage-safe train/holdout split (q110): near-dup cluster members
    * always land in the same split.
    *
    * Cluster-atomicity is exact; pair RECALL is the knob. The default
    * scale path builds pairs with banded LSH ([[nearDupPairs]]), whose
    * detection probability follows the S-curve — pairs right at the
    * threshold can be missed (~60% at jac = 0.5 with 8 bands of 4),
    * and a missed pair may straddle splits. `exact = true` switches to
    * the O(n²) exact-Jaccard pair scan (what q110's oracle-gated form
    * uses): airtight, but verify/test scale only. For the scale path,
    * lower `threshold` below the leakage level you care about so the
    * S-curve's steep part sits above it. */
  def leakageSafeSplit(docs: Dataset[Document], threshold: Double = 0.5,
      trainPct: Int = 80, exact: Boolean = false): Dataset[SplitAssignment] = {
    import docs.sparkSession.implicits._
    val pairs =
      if (exact)
        TextDedup.jaccardPairsExact(docs.toDF(), "doc_id", "text", 3, threshold)
          .select(col("id_a"), col("id_b"))
      else nearDupPairs(docs, threshold).toDF().select(col("id_a"), col("id_b"))
    DedupClusters.leakageSafeSplit(docs.toDF(), "doc_id",
        DedupClusters.components(pairs), trainPct)
      .as[SplitAssignment]
  }

  /** Per-slice token-distribution drift vs the corpus mix (q107):
    * `sliceBy` any Document field. */
  def drift(docs: Dataset[Document], sliceBy: String = "source"): Dataset[SliceDrift] = {
    import docs.sparkSession.implicits._
    val toks = docs.toDF().select(col(sliceBy).as("slice"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    Drift.klBySlice(toks, "slice", "tok").as[SliceDrift]
  }

  /** Per-doc n-gram novelty vs a reference corpus (q111): 1.0 = no
    * shingle overlap with the reference, 0.0 = fully contained. */
  def novelty(docs: Dataset[Document], reference: Dataset[Document],
      ngram: Int = 3): org.apache.spark.sql.DataFrame =
    TextDedup.noveltyVsReference(docs.toDF(), reference.toDF(),
      "doc_id", "text", ngram)

  /** Deflate-ratio quality column (q118): repetition/boilerplate
    * compresses far below prose. */
  def compressionRatio(docs: Dataset[Document]): org.apache.spark.sql.DataFrame =
    docs.toDF().select(col("doc_id"),
      TextAnalysis.compressionRatio(col("text")).as("deflate_ratio"))

  /** Canonical text normalization in place (q144): NFC, zero-width
    * strip, control→space, whitespace collapse. n_chars is recomputed
    * so the record stays self-consistent. */
  def normalize(docs: Dataset[Document]): Dataset[Document] = {
    import docs.sparkSession.implicits._
    docs.toDF()
      .withColumn("text", TextAnalysis.normalizeText(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .as[Document]
  }

  /** In-engine Naive Bayes classifier scores against any boolean label
    * built from Document fields (q141): train + score in one call,
    * both exactly reproducible. `label` must be non-null per row. */
  def classifierScores(docs: Dataset[Document],
      label: org.apache.spark.sql.Column): Dataset[ClassifierScore] = {
    import docs.sparkSession.implicits._
    TextAnalysis.nbClassifierScores(docs.toDF(), "doc_id", "text", label)
      .as[ClassifierScore]
  }

  /** Snapshot diff between two corpus drops (q142): text+lang+source
    * compared null-safely per doc_id. */
  def snapshotDiff(oldDrop: Dataset[Document],
      newDrop: Dataset[Document]): Dataset[DiffStatus] = {
    import oldDrop.sparkSession.implicits._
    graft.operators.SnapshotDiff.diff(oldDrop.toDF(), newDrop.toDF(),
      "doc_id", Seq("text", "lang", "source")).as[DiffStatus]
  }

  /** Contrastive training triplets from the corpus' near-dup structure
    * (q145): positives via [[nearDupPairs]], deterministic negative
    * draws over [0, maxIdExclusive). */
  def contrastiveTriplets(docs: Dataset[Document], maxIdExclusive: Long,
      threshold: Double = 0.5): Dataset[Triplet] = {
    import docs.sparkSession.implicits._
    graft.operators.Contrastive.tripletsFromPairs(
      nearDupPairs(docs, threshold).toDF().select(col("id_a"), col("id_b")),
      docs.toDF(), "doc_id", maxIdExclusive).as[Triplet]
  }

  /** PII audit rows (q153): one row per occurrence with its type,
    * under redaction's email→ip→phone precedence. */
  def piiAudit(docs: Dataset[Document]): org.apache.spark.sql.DataFrame =
    TextAnalysis.piiMatches(docs.toDF(), "doc_id", "text")

  /** Temperature-scaled source mixing weights (q155): per-`groupBy`
    * n^α/Σn^α and floor targets for a `sampleTotal`-doc draw. */
  def temperatureMix(docs: Dataset[Document], groupBy: String,
      alpha: Double, sampleTotal: Long): org.apache.spark.sql.DataFrame =
    WeightedSample.temperatureWeights(docs.toDF(), groupBy, alpha, sampleTotal)

  /** Quality-threshold sweep (q156): survivors per candidate cutoff. */
  def qualitySweep(docs: Dataset[Document],
      thresholds: Seq[Double] = TextAnalysis.defaultQualityThresholds)
      : org.apache.spark.sql.DataFrame =
    TextAnalysis.qualityThresholdSweep(docs.toDF(), "text", thresholds)

  /** Train a BPE merge table on the corpus (q117's trainer — the
    * HF-style distributed-histogram / driver-merge-loop split). The
    * returned merges are a plain value: broadcastable, serializable,
    * reusable across corpora. */
  def trainBpe(docs: Dataset[Document], numMerges: Int = 50): Seq[(String, String)] =
    Bpe.fit(docs.toDF(), "text", numMerges)

  /** Tokenizer-billed (BPE) vs whitespace token counts per doc — the
    * pretraining cost estimator under a REAL merge table. */
  def tokenBill(docs: Dataset[Document],
      merges: Seq[(String, String)]): Dataset[TokenBill] = {
    import docs.sparkSession.implicits._
    docs.toDF().select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_words"),
        Bpe.segmentCount(col("text"), merges).as("n_bpe"))
      .as[TokenBill]
  }

  /** Tokenize to trainable token IDS under the COMMITTED tokenizer
    * asset ([[graft.BpeAssets]] — train-once ids, stable across
    * corpora; q119's surface as a typed facade). */
  def tokenize(docs: Dataset[Document]): Dataset[TokenizedDoc] = {
    import docs.sparkSession.implicits._
    docs.toDF().select(col("doc_id"),
        Bpe.encodeIds(col("text"),
          graft.BpeAssets.merges, graft.BpeAssets.vocabMap).as("token_ids"))
      .as[TokenizedDoc]
  }

  /** [[tokenize]] packed into fixed-`chunkLen` doc-bounded training
    * chunks (q124's surface): one row per chunk, ids in order. A doc
    * whose token stream is EMPTY (empty/whitespace text) produces no
    * chunks — there is nothing to train on — so this output has fewer
    * doc_ids than [[tokenize]]'s on such input; join back to the doc
    * table (not to tokenize) when full-coverage accounting matters. */
  def tokenizeChunked(docs: Dataset[Document],
      chunkLen: Int = 64): Dataset[TokenChunk] = {
    import docs.sparkSession.implicits._
    tokenize(docs).toDF()
      .select(col("doc_id"), posexplode(col("token_ids")).as(Seq("pos", "tid")))
      .groupBy(col("doc_id"), expr(s"pos div $chunkLen").as("chunk_idx"))
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("pos"), col("tid")))),
        s => s.getField("tid")).as("token_ids"))
      .as[TokenChunk]
  }

  /** DSIR-style importance selection (q163): the `raw` docs that most
    * resemble the `target` exemplar corpus under add-α-smoothed
    * unigram+bigram log importance ratios, top-k with an id tiebreak. */
  def dsirSelect(raw: Dataset[Document], target: Dataset[Document],
      k: Int, alpha: Double = 1.0): Dataset[DsirPick] = {
    import raw.sparkSession.implicits._
    graft.operators.Dsir.selectTopK(raw.toDF(), target.toDF(), k,
      alpha = alpha).as[DsirPick]
  }

  /** Distinct-n templatedness report per slice (q165): distinct-1/2
    * ratios — the diversity number to read before admitting synthetic
    * text into a mix. */
  def diversityReport(docs: Dataset[Document],
      sliceBy: String = "source"): org.apache.spark.sql.DataFrame =
    TextAnalysis.distinctNgrams(docs.toDF(), sliceBy, "text")

  /** Gopher's top-n-gram repetition rule per doc (q166): the dominant
    * phrase and the fraction of token characters it covers. */
  def topNgramRepetition(docs: Dataset[Document],
      n: Int = 2): org.apache.spark.sql.DataFrame =
    TextAnalysis.topNgramCharFraction(docs.toDF(), "doc_id", "text", n)

  /** Exact edit-distance near-dup pairs (PassJoin banding + verify —
    * the q203 path). `score` = edit distance over the compared prefix:
    * LOWER = more duplicate (the [[simhashPairs]] polarity). */
  def editNearDups(docs: Dataset[Document], maxDist: Int = 2,
      prefixLen: Int = 60): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    TextDedup.editNearDupPairs(docs.toDF(), "doc_id", "text", maxDist, prefixLen)
      .select(col("id_a"), col("id_b"), col("dist").cast("double").as("score"))
      .as[NearDupPair]
  }

  /** Line-level boilerplate strip (q201): text replaced by the kept
    * lines, n_chars recomputed. */
  def stripBoilerplate(docs: Dataset[Document]): Dataset[Document] = {
    import docs.sparkSession.implicits._
    docs.toDF()
      .withColumn("text", TextAnalysis.stripBoilerplate(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .as[Document]
  }

  /** Quantile curriculum phases over the lexical difficulty score
    * (q200's path — one range-partitioned sort, no global window). */
  def curriculum(docs: Dataset[Document],
      numPhases: Int = 4): Dataset[CurriculumSlot] = {
    import docs.sparkSession.implicits._
    Curriculum.phases(docs.toDF(), numPhases)
      .select(col("phase"), col("rank_in_phase"), col("doc_id"),
        col("n_tok"), col("difficulty"))
      .as[CurriculumSlot]
  }

  /** Deterministic resumable epoch order (q202's path). */
  def epochSchedule(docs: Dataset[Document],
      numEpochs: Int): Dataset[EpochSlot] = {
    import docs.sparkSession.implicits._
    EpochShuffle.schedule(docs.toDF(), numEpochs)
      .select(col("epoch"), col("position"), col("doc_id"))
      .as[EpochSlot]
  }

  /** Trigram stupid-backoff LM score against a reference corpus
    * (q214's path): n = scored trigram positions; `triFrac` rides
    * along in [[BackoffScore]] as the in-distribution diagnostic. */
  def backoffScore(docs: Dataset[Document],
      reference: Dataset[Document]): Dataset[BackoffScore] = {
    import docs.sparkSession.implicits._
    UnigramLm.trigramStupidBackoff(docs.toDF(), reference.toDF())
      .select(col("doc_id"), col("n_trigrams").as("n"),
        col("tri_frac"), col("logprob_avg"))
      .as[BackoffScore]
  }

  /** Sliding token-window chunks (q215's path). */
  def chunk(docs: Dataset[Document], window: Int = 64,
      stride: Int = 48): Dataset[TextChunk] = {
    import docs.sparkSession.implicits._
    Chunking.chunk(docs.toDF(), window = window, stride = stride)
      .as[TextChunk]
  }

  /** Multiclass NB domain prediction, trained on a labeled reference
    * (q217's path): label = any Document field name. */
  def classifyDomain(docs: Dataset[Document],
      reference: Dataset[Document],
      labelBy: String = "source"): Dataset[DomainPrediction] = {
    import docs.sparkSession.implicits._
    NbClassifier.classify(docs.toDF(),
        reference.toDF().withColumn("label", col(labelBy)))
      .select(col("doc_id"), col("pred"), col("score"))
      .as[DomainPrediction]
  }
}
