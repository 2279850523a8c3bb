package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contrastive training-pair mining — turning the dedup pipeline's
  * near-duplicate PAIRS into (anchor, positive, negative) triplets for
  * embedding-model training (the SimCSE/CLIP-style data shape):
  * near-dups make natural positives (same content, different surface),
  * and negatives are drawn pseudo-randomly from the corpus.
  *
  * The negative draw is a DETERMINISTIC Knuth-style mix of
  * (anchor, positive) reduced mod `maxIdExclusive` — reproducible at
  * any parallelism, no RNG state, and exactly replayable by a SQL
  * engine (the q47 hash-split discipline; xxhash64 would be faster
  * still but has no DuckDB mirror). A draw can land inside the
  * anchor's own positive set (it IS random); rather than probing —
  * which serializes — the row carries `neg_clean` = 0 and the trainer
  * drops or redraws flagged rows (flagged fraction ≈ cluster-size /
  * corpus-size, negligible at scale).
  *
  * Scale shape: symmetrize is a narrow union; the negative id is
  * per-row arithmetic; existence and cleanliness are two joins against
  * SMALL frames (the corpus-id projection — one slim column — and the
  * near-dup pair set, which is dup-cluster-sized, ≪ corpus²). No
  * window, no collect.
  */
object Contrastive {

  /** Build triplets from a (id_a, id_b) near-dup pair frame.
    * Returns (anchor_id, pos_id, neg_id, neg_clean) — every pair in
    * both directions, negative drawn from [0, maxIdExclusive) and
    * inner-joined against `corpusIds` (for the contiguous-id corpora
    * training pipelines produce, every draw exists; holes simply drop
    * the triplet, deterministically). `neg_clean` = 1 unless the draw
    * hit the anchor, the positive, or another of the anchor's
    * positives. */
  /** The id range the LEGACY (all-long) draw covers; larger id spaces
    * switch to the decimal mix below. */
  private val legacyDrawDomain = 2650000000000000L

  def tripletsFromPairs(pairs: DataFrame, corpusIds: DataFrame,
      idCol: String, maxIdExclusive: Long): DataFrame = {
    require(maxIdExclusive > 0, "maxIdExclusive must be positive")
    // distinct AFTER symmetrizing: the canonical input is distinct
    // (id_a < id_b) pairs, but a caller passing both orientations or
    // duplicate pair rows would otherwise duplicate triplet rows AND
    // fan out the cleanliness left-join below (duplicate posSet keys)
    val pos = pairs
      .select(col("id_a").cast("long").as("anchor_id"),
        col("id_b").cast("long").as("pos_id"))
      .unionByName(pairs.select(col("id_b").cast("long").as("anchor_id"),
        col("id_a").cast("long").as("pos_id")))
      .distinct()
    // pre-reduce BOTH ids mod primes so the multiplies stay in BIGINT-
    // safe range for 64-bit production ids (the q47 overflow
    // discipline), and reduce mod maxIdExclusive DIRECTLY — an
    // intermediate mod 2^32 would confine every draw to the low 4.3B
    // ids of a larger corpus. The all-long mix tops out near 2.65e15
    // (2.65e15 docs ≈ 10^4 × a 100 TB crawl) and is kept bit-stable
    // for reproducibility (q145's oracle replays it); id spaces BEYOND
    // that switch to a DECIMAL(38,0) mix whose MMIX-multiplier domain
    // (~6.4e24) covers every residue of any 63-bit maxIdExclusive —
    // exactly replayable by HUGEINT arithmetic in a SQL engine, so the
    // wide path keeps the no-RNG determinism contract (specced against
    // a BigInt replay).
    val mix: Column =
      if (maxIdExclusive <= legacyDrawDomain)
        pmod(col("anchor_id"), lit(1000003L)) * lit(2654435761L) +
          pmod(col("pos_id"), lit(999983L)) * lit(40503L) +
          lit(2246822519L)
      else {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        pmod(col("anchor_id"), lit(1000003L)).cast(dec) *
          lit(6364136223846793005L) +
          pmod(col("pos_id"), lit(999983L)).cast(dec) * lit(40503L) +
          lit(2246822519L)
      }
    val drawn = pos.withColumn("neg_id",
      pmod(mix, lit(maxIdExclusive)).cast("long"))
    val ids = corpusIds.select(col(idCol).cast("long").as("neg_id")).distinct()
    val posSet = pos.select(col("anchor_id"), col("pos_id").as("neg_id"),
      lit(1).as("__dup"))
    drawn.join(ids, Seq("neg_id")) // existence; slim one-column join
      .join(posSet, Seq("anchor_id", "neg_id"), "left") // cleanliness
      .select(col("anchor_id"), col("pos_id"), col("neg_id"),
        when(col("neg_id") === col("anchor_id"), 0)
          .when(col("__dup").isNotNull, 0)
          .otherwise(1).as("neg_clean"))
  }

  /** HARD-negative mining — the other half of the contrastive data
    * story ([[tripletsFromPairs]] draws RANDOM negatives; retrieval-
    * quality training wants the negatives the model currently confuses,
    * the DPR/SimCSE hard-negative recipe): for each labeled anchor,
    * the top-`k` most-cosine-similar vectors with a DIFFERENT label,
    * plus the margin to the anchor's nearest SAME-label vector (the
    * number a curriculum thresholds on — a negative inside the margin
    * is "hard").
    *
    * ONE corpus pass for both legs: the broadcast anchor batch joins
    * the corpus once, self-pairs drop, and a single bounded heap keyed
    * by (anchor, same_label) cuts to k rows per leg — negatives are the
    * same=false leg, the positive is the same=true leg's rank 1; no
    * second scan, no window over the corpus. Deterministic (exact
    * cosine, id tiebreaks) → fully SQL-mirrorable.
    *
    * Output: (anchor_id, rank 1..k, neg_id, neg_cos, margin) with
    * margin = pos₁_cos − neg_cos (rounded 4dp; NULL if the anchor's
    * label has no other member).
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val a = anchors.select(col(idCol).as("anchor_id"),
      col(vecCol).as("__avec"), col(labelCol).as("__albl"))
    val joined = graft.GraftSession.widen(corpus).crossJoin(broadcast(a))
      .filter(col(idCol) =!= col("anchor_id"))
      .select(col("anchor_id"), col(idCol).as("neg_id"),
        (col(labelCol) === col("__albl")).as("__same"),
        (-cosine(col(vecCol), col("__avec"))).as("__negcos"))
    val top = graft.plans.TopKPerKey.rankedTopKMulti(
      joined, Seq("anchor_id", "__same"), Seq("__negcos", "neg_id"), k)
    val pos = top.filter(col("__same") && col("rank") === 1)
      .select(col("anchor_id"), (-col("__negcos")).as("__poscos"))
    top.filter(!col("__same"))
      .join(broadcast(pos), Seq("anchor_id"), "left_outer")
      .select(col("anchor_id"), col("rank"), col("neg_id"),
        round(-col("__negcos"), 4).as("neg_cos"),
        round(col("__poscos") - (-col("__negcos")), 4).as("margin"))
  }
}
