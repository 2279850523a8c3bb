package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for text at training-pipeline scale.
  *
  * Everything except the SimHash packer is Catalyst built-ins
  * (split / transform / aggregate / xxhash64), so shingling and MinHash
  * run inside whole-stage codegen and the only shuffles are the
  * band-bucket join (on a compact LONG key) and the final verify.
  *
  * Pipeline shape at 100 TB:  docs → shingle+minhash (narrow, codegen)
  * → explode bands (×B) → groupBy(band, bandKey) buckets (shuffle on
  * int+long) → pair candidates within buckets (skew-capped) → exact
  * Jaccard verify on the candidate pairs only (≪ n²).
  */
object TextDedup {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles as strings ("a b c"). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Distinct 64-bit shingle hashes (the set representation).
    *
    * One pass over the token stream: hash each token once, then chain
    * the n token hashes per window (injective up to 64-bit collisions —
    * equivalent to hashing the joined n-gram string for Jaccard
    * purposes, without materializing per-shingle strings). A tight UDF
    * deliberately: the `transform∘concat_ws∘slice` column composition
    * is CodegenFallback-interpreted and measured ~6× slower, and both
    * forms break whole-stage codegen equally.
    */
  def shingleHashes(text: Column, n: Int): Column = {
    val f = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else {
        import org.apache.spark.sql.catalyst.expressions.XXH64
        val toks = text.trim.toLowerCase.split("\\s+")
        val th = new Array[Long](toks.length)
        var i = 0
        while (i < toks.length) {
          th(i) = XXH64.hashUTF8String(
            org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)), 42L)
          i += 1
        }
        val out = new java.util.LinkedHashSet[Long]()
        if (toks.length < n) { // short-doc fallback: one whole-text shingle
          var h = 42L
          var j = 0
          while (j < toks.length) { h = XXH64.hashLong(th(j), h); j += 1 }
          out.add(h)
        } else {
          var s = 0
          while (s <= toks.length - n) {
            var h = 42L
            var j = s
            while (j < s + n) { h = XXH64.hashLong(th(j), h); j += 1 }
            out.add(h)
            s += 1
          }
        }
        val arr = new Array[Long](out.size)
        val it = out.iterator
        var k = 0
        while (it.hasNext) { arr(k) = it.next(); k += 1 }
        arr
      }
    }
    f(text)
  }

  /** MinHash signature: k independent hash "permutations"
    * h_i(x) = XXH64(x, seed_i), min per permutation over the shingle
    * hashes.
    *
    * Implemented as ONE tight-loop JVM function rather than k
    * `array_min∘transform` column compositions: Spark's higher-order
    * functions are CodegenFallback (interpreted, no common-subexpression
    * elimination), so the composition re-evaluated the shingle subtree
    * per permutation — measured 13.6s for 5k docs where this loop takes
    * ~0.3s. Same hash family (xxhash64 of the 64-bit shingle hash,
    * per-permutation seed), deterministic for a fixed seed.
    */
  def minhashSignature(hashes: Column, k: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val seeds = Array.fill(k)(rng.nextLong())
    val f = udf { (hs: Seq[Long]) =>
      if (hs == null || hs.isEmpty) new Array[Long](seeds.length)
      else {
        val out = new Array[Long](seeds.length)
        var i = 0
        while (i < seeds.length) {
          val s = seeds(i)
          var m = Long.MaxValue
          val it = hs.iterator
          while (it.hasNext) {
            val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(it.next(), s)
            if (v < m) m = v
          }
          out(i) = m
          i += 1
        }
        out
      }
    }
    f(hashes)
  }

  /** LSH banding: (doc, band_id, band_key) — docs sharing a band key are
    * near-dup candidates. bands·rowsPerBand must equal the signature
    * length. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band_id"),
        xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))).as("band_key")))

  /** Per-doc n-gram novelty vs a reference corpus: the fraction of the
    * doc's DISTINCT shingles present nowhere in the reference — the
    * "new information" score curation pipelines use to rank crawl
    * snapshots and filter boilerplate re-crawls (complement of the
    * decontamination overlap).
    *
    * Scale shape: the decontamination join — both sides reduce to
    * (id/∅, shingle-hash) rows, the reference set dedups with one
    * shingle-keyed aggregation, the left join is shingle-keyed (each
    * doc shingle matches at most one distinct reference row, no
    * fanout), and the per-doc fraction is a count aggregation. */
  def noveltyVsReference(
      docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, ngram: Int, scale: Int = 6): DataFrame = {
    val d = graft.GraftSession.widen(docs).select(col(idCol).as("__nid"),
      explode(shingleHashes(col(textCol), ngram)).as("sh"))
    val ref = graft.GraftSession.widen(reference)
      .select(explode(shingleHashes(col(textCol), ngram)).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1))
    d.join(ref, Seq("sh"), "left")
      .groupBy(col("__nid"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("__nid").as(idCol), col("n_shingles"),
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"),
          scale).as("novelty"))
  }

  /** Exact token-set Jaccard similarity of two token arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(1.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Brute-force pairwise n-gram-Jaccard near-dup pairs (the exact
    * oracle; O(n²) within a blocking key — test scale, or use as the
    * verify stage after LSH). Returns (id_a, id_b, jac) with id_a<id_b.
    */
  def jaccardPairsExact(
      docs: DataFrame, idCol: String, textCol: String,
      ngram: Int, threshold: Double, blockCol: Option[String] = None): DataFrame = {
    val withSh = graft.GraftSession.widen(docs).select(
      Seq(col(idCol).as("id"), shingleHashes(col(textCol), ngram).as("sh")) ++
        blockCol.map(c => col(c).as("block")): _*)
    val a = withSh.select(
      Seq(col("id").as("id_a"), col("sh").as("sh_a")) ++
        blockCol.map(_ => col("block")): _*)
    val b = withSh.select(
      Seq(col("id").as("id_b"), col("sh").as("sh_b")) ++
        blockCol.map(_ => col("block")): _*)
    val joined = blockCol match {
      case Some(_) => a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      case None => a.crossJoin(b).filter(col("id_a") < col("id_b"))
    }
    joined
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** MinHash+LSH near-dup pairs: banded candidate generation + exact
    * Jaccard verify. Output ⊆ jaccardPairsExact output; recall governed
    * by (bands, rowsPerBand) vs threshold (standard S-curve).
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, seed: Long = 42L,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val wide = graft.GraftSession.widen(docs)
    // One signature pass; band rows carry only (id, band) — the wide
    // shingle arrays never enter the bucket shuffle. The exchange
    // (repartition) between the signature projection and the explode is
    // load-bearing: projections get codegen subexpression elimination
    // but Generate does not, so without the boundary Catalyst collapses
    // the minhash subtree into the generator and re-evaluates it per
    // band reference (a measured ~15× regression). The shuffled payload
    // is just (id, numHashes longs) per doc — negligible at any scale.
    val sigDf = wide
      .select(
        col(idCol).as("id"),
        minhashSignature(shingleHashes(col(textCol), ngram), numHashes, seed).as("sig"))
      .repartition(wide.sparkSession.sparkContext.defaultParallelism)
    val bandRows = sigDf
      .select(col("id"), explode(lshBands(col("sig"), bands, r)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_key"))
    // Bucket ids per (band_id, band_key); generate i<j pairs inside each
    // bucket with index-aware transforms (no self-join, one shuffle).
    // maxBucketSize is the skew guard for adversarial/degenerate corpora
    // — oversized buckets are dropped, trading recall for boundedness.
    val buckets = bandRows.groupBy(col("band_id"), col("band_key"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    val pairs = buckets.select(explode(flatten(transform(
      col("ids"), (a, i) => transform(
        slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(least(a, b).as("id_a"), greatest(a, b).as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct() // same pair can collide in several bands
    // Verify stage: exact Jaccard on candidates only. Shingle the
    // CANDIDATE docs, not the corpus: joining a full (id, shingles)
    // projection per pair side would re-run the n-gram hashing over
    // every document twice more (candidates are a vanishing fraction of
    // the corpus at scale). The broadcast semi-join filters the corpus
    // scan BEFORE the shingle projection, so hashing runs only for docs
    // that appear in some pair. `pairs` feeds both the id filter and the
    // final join — its shuffle stages are canonically identical subtrees,
    // which ReuseExchange evaluates once.
    val candIds = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val shCand = wide
      // wide(idCol), not col(idCol): when the caller's id column is
      // itself named "id", the unqualified name is ambiguous between
      // the two join sides and analysis fails
      .join(broadcast(candIds), wide(idCol) === candIds("id"), "left_semi")
      .select(col(idCol).as("id"), shingleHashes(col(textCol), ngram).as("sh"))
    pairs
      .join(shCand.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shCand.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** SimHash: 64-bit fingerprint — per-token 64-bit hashes vote ±1 on
    * each bit position; fingerprint bit b = sign of the vote sum.
    * Near-dups have small Hamming distance. Packer is a tiny UDF (bit
    * loop); the token hashing stays in codegen.
    */
  private val packSimhash = udf { (hashes: Seq[Long]) =>
    if (hashes == null || hashes.isEmpty) 0L
    else {
      val votes = new Array[Int](64)
      hashes.foreach { h =>
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
      fp
    }
  }

  def simhash(text: Column, ngram: Int = 2): Column =
    packSimhash(shingleHashes(text, ngram))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs WITHOUT the all-pairs cross join: split the
    * 64-bit fingerprint into `maxHamming + 1` disjoint bands — two
    * fingerprints within Hamming distance `maxHamming` cannot differ in
    * every band (pigeonhole), so an equality self-join on any one band
    * finds every qualifying pair. Exact, not probabilistic: band-match
    * candidates are verified with the true Hamming distance, so the
    * output EQUALS the brute-force pair set (specced) — the same
    * band-then-verify shape as MinHash-LSH but with a soundness
    * guarantee.
    *
    * Scale, honestly quantified (ProbeBands, sf0.1): candidate pairs
    * 1.10M vs 12.5M brute — an 11× cut. The reduction is a CONSTANT
    * factor bounded by the band-value space: 9 bands of ~7 bits give at
    * most ~128 buckets per band, so Σ|bucket|² stays Θ(n²/buckets) as
    * the corpus grows. That is the fingerprint width's limit, not the
    * operator's: Hamming ≤ 3 yields 4 × 16-bit bands (65k values/band),
    * and a 128-bit fingerprint doubles every band width — multi-index
    * hashing (Norouzi et al. 2012) sizes bands to corpus scale exactly
    * this way. At fixture scale the brute cross join is FASTER (one
    * codegen'd popcount pass, no shuffles) — banding pays off where the
    * n² candidate stream stops fitting through one node. The verify
    * stage re-joins fingerprints by id — narrow lookups, no text. */
  def simhashPairsBanded(
      df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 2, maxHamming: Int = 8): DataFrame = {
    // Fingerprinting (shingle + hash + vote over full text) dwarfs the
    // pair stage; materialize the tiny (id, fp) table ONCE instead of
    // recomputing it on both join sides and again at verify (eager
    // localCheckpoint — the DedupClusters lineage-control pattern; at
    // production scale fps are a standing table, see Bm25.buildIndex).
    val fp = graft.GraftSession.widen(df)
      .select(col(idCol).as("id"), simhash(col(textCol), ngram).as("fp"))
      .localCheckpoint()
    simhashPairsBandedFp(fp, maxHamming)
  }

  /** (id, band, bval) band projection of a fingerprint table: band i
    * covers bits [i·64/n, (i+1)·64/n), n = maxHamming + 1 disjoint
    * bands. Shared by the pair join and the band-skew probe so both
    * always measure the SAME layout. */
  def bandedFingerprints(fp: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming in [0,64): $maxHamming")
    val nBands = maxHamming + 1
    fp.select(col("id"), explode(array(
      (0 until nBands).map { i =>
        val lo = i * 64 / nBands
        val hi = (i + 1) * 64 / nBands
        // width can be the full 64 (maxHamming = 0): JVM long shifts
        // mask the count to 6 bits, so 1L << 64 == 1L would zero the
        // mask and collapse EVERY fingerprint into one bucket — the
        // all-pairs blowup this operator exists to avoid
        val mask = if (hi - lo >= 64) lit(-1L) else lit((1L << (hi - lo)) - 1)
        struct(lit(i).as("band"),
          shiftrightunsigned(col("fp"), lo).bitwiseAND(mask).as("bval"))
      }: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bval").as("bval"))
  }

  /** As [[simhashPairsBanded]], over precomputed fingerprints
    * (id, fp) — the standing-table serving form. */
  def simhashPairsBandedFp(fp: DataFrame, maxHamming: Int = 8): DataFrame = {
    val banded = bandedFingerprints(fp, maxHamming)
    // candidates move as bare (id_a, id_b) pairs — the bucket-squared
    // blowup carries 16 bytes/row, not fingerprints or text
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(fp.select(col("id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
      .join(fp.select(col("id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
      .withColumn("ham", hamming(col("fp_a"), col("fp_b")))
      .filter(col("ham") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("ham"))
  }

  /** Embedding-cosine near-duplicate pairs (brute force over a blocking
    * key or all pairs; ANN/LSH is the scale path — see AnnForestModel). */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val wide = graft.GraftSession.widen(df)
    val a = wide.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    // `b` stays narrow: it's the broadcast-style inner side of the
    // pair-generation cross join; `a` (widened) drives parallelism.
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Benchmark decontamination: for every (train doc, benchmark doc)
    * pair sharing n-gram shingles, the fraction of the benchmark doc's
    * distinct shingles present in the train doc. Pairs at/above
    * `minFrac` are contamination hits (drop or flag the train doc).
    *
    * Shape: explode distinct shingles on both sides, equi-join on the
    * shingle, count per pair — the standard MapReduce decontamination
    * join. Two shuffles: the shingle join and the compact
    * (train, bench) pair count (the optional df cap adds a third,
    * compact one: partially-aggregated shingle counts). `maxShingleDf`
    * (0 = off) drops
    * shingles occurring in more than that many TRAIN docs before the
    * join — stop-phrase shingles ("of the united states") otherwise
    * produce quadratic join blowup at corpus scale; a shingle that
    * common carries no contamination signal. Joins on 64-bit
    * [[shingleHashes]] (8-byte keys; the string form measured 9× slower
    * at sf0.1 — interpreted HOF shingling plus string exchange). Counts
    * equal the string join modulo 64-bit collisions; the q69/q139
    * DuckDB oracles recompute overlap from shingle STRINGS, so the
    * driver's hash gate independently certifies collision-freedom on
    * the fixture rather than mirroring the hashed path.
    */
  def contaminationPairs(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, minFrac: Double = 0.5, maxShingleDf: Int = 0): DataFrame = {
    val t0 = train.select(col(idCol).as("train_id"),
      explode(shingleHashes(col(textCol), ngram)).as("sh"))
    contaminationTail(t0, bench, idCol, textCol, ngram, minFrac, maxShingleDf)
  }

  /** [[contaminationPairs]] with a broadcast Bloom prefilter — the
    * 100 TB shape. The benchmark side is small by definition (a held-out
    * eval set); its distinct shingle hashes are folded into a Bloom
    * filter with ONE distributed pass (`stat.bloomFilter` runs
    * tree-aggregated on executors; only the finished ~`n·log2(1/fpp)`
    * bits reach the driver — ~1.2 MB per million shingles at 1%; the
    * filter is sized from a narrow token-count scan, not a second
    * shingle pass). The
    * corpus-sized train side then drops non-benchmark shingles in a
    * NARROW codegen'd filter (the native `BloomFilterMightContain`
    * expression over a literal sketch — no UDF, no shuffle) before any
    * exchange: only candidate-contaminated rows ever enter the shingle
    * join, instead of every train shingle shuffling to meet a bench
    * partition.
    *
    * Exactness: a Bloom filter has NO false negatives, and the hot-cap
    * document frequencies are per-shingle (a surviving shingle keeps
    * ALL its rows, so its df is unchanged), so the result is
    * bit-identical to [[contaminationPairs]] — false positives are
    * harmless extra rows that die in the equi-join. Same full DuckDB
    * oracle, not a weaker probabilistic gate (specced equal on the
    * same inputs).
    */
  def contaminationPairsBloom(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, minFrac: Double = 0.5, maxShingleDf: Int = 0,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val bHashes = bench
      .select(explode(shingleHashes(col(textCol), ngram)).as("h")).distinct()
    // size the filter from a cheap UPPER BOUND — the bench side's total
    // token count (shingles per doc ≤ tokens per doc) — so the sizing
    // action is one narrow scan of the bench text, not a second
    // explode+distinct pass over the shingles; over-sizing only lowers
    // the realized fpp. 64 floors degenerate inputs.
    val nItems = math.max(bench
      .agg(coalesce(sum(TextAnalysis.tokenCount(col(textCol))), lit(0L)))
      .head().getLong(0), 64L)
    val bloomBytes = {
      val bloom = bHashes.stat.bloomFilter("h", nItems, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bloomBytes),
        GraftBridge.expression(col("sh"))))
    val t0 = train.select(col(idCol).as("train_id"),
        explode(shingleHashes(col(textCol), ngram)).as("sh"))
      .filter(mightContain)
    contaminationTail(t0, bench, idCol, textCol, ngram, minFrac, maxShingleDf)
  }

  /** Shared decontamination tail over an (already exploded, possibly
    * prefiltered) `(train_id, sh)` frame: hot-shingle cap, shingle
    * equi-join, per-pair overlap count, coverage-fraction threshold. */
  private def contaminationTail(
      t0: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      ngram: Int, minFrac: Double, maxShingleDf: Int): DataFrame = {
    val t =
      if (maxShingleDf <= 0) t0
      else {
        // the cap must not itself hit the skew it guards against: a
        // window partitioned by shingle would land ALL of a hot
        // stop-phrase's rows on one task just to discard them. Instead
        // aggregate document frequencies with map-side partial counts
        // (compact (shingle, count) rows cross the shuffle), keep only
        // the over-cap shingles — a small set by construction,
        // |hot| ≤ Σdf/cap — and broadcast-anti-join them out: the hot
        // rows die in a narrow filter, never concentrating anywhere.
        val hot = t0.groupBy(col("sh"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxShingleDf)
          .select(col("sh"))
        t0.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val b = bench.select(col(idCol).as("bench_id"),
        shingleHashes(col(textCol), ngram).as("shs"))
      .select(col("bench_id"), size(col("shs")).as("n_bench"),
        explode(col("shs")).as("sh"))
    t.join(b, Seq("sh"))
      .groupBy(col("train_id"), col("bench_id"), col("n_bench"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("frac", col("n_common").cast("double") / col("n_bench"))
      .filter(col("frac") >= minFrac)
      .select(col("train_id"), col("bench_id"), col("n_common"), col("frac"))
  }

  /** Per-document duplicated-span metrics — the per-doc view of exact
    * substring duplication (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"): for every document, the
    * fraction of its distinct n-gram spans that also occur in at least
    * one OTHER document. High-ratio docs are boilerplate / template
    * copies that near-dup pair mining (whole-doc Jaccard) can miss when
    * the shared spans sit inside otherwise-distinct documents; pipelines
    * threshold on `dup_ratio` or route high scorers to span-level
    * scrubbing.
    *
    * Shape: explode distinct shingles (narrow), document-frequency
    * aggregation with map-side partial counts (compact (shingle, df)
    * rows cross the shuffle), one equi-join back, one per-doc agg.
    * Same skew discipline as [[contaminationPairs]]: df is computed by
    * aggregation, never a per-shingle window, so a hot boilerplate
    * shingle costs one combine tree, not one giant task. Joins on
    * 64-bit [[shingleHashes]] (8-byte keys — the same 9×-at-sf0.1
    * switch as [[contaminationPairs]]); q76's string-shingle DuckDB
    * oracle independently certifies the counts collision-free on the
    * fixture. */
  def dupShingleStats(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3): DataFrame = {
    val ex = docs.select(col(idCol),
      explode(shingleHashes(col(textCol), ngram)).as("sh"))
    // distinct docs per shingle == row count per shingle (ex is distinct
    // per doc by construction) — a plain count, partial-agg friendly
    val df = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    ex.join(df, "sh")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_shingles"))
      .withColumn("dup_ratio",
        round(col("n_dup_shingles") / col("n_shingles"), 4))
  }

  /** Duplicated-span REMOVAL, keep-first — the scrub that
    * [[dupShingleStats]] only measures (the exact-substring-dedup
    * pipeline stage of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499, in its
    * non-overlapping-window form): split each document into
    * consecutive `window`-token segments, and keep an occurrence of a
    * segment iff it is the corpus-wide FIRST occurrence in
    * (`idCol`, seg_idx) order — every later repeat of a boilerplate
    * block is dropped while its first sighting survives, so no text is
    * lost, only repetition. Deterministic by construction (exact
    * string keys, total first-occurrence order), hence fully
    * SQL-mirrorable.
    *
    * Output per document: n_seg, n_kept, kept_tokens (token count of
    * the surviving text) and kept_md5 — the md5 of the surviving
    * segments rejoined in segment order (the q67 full-output-compare
    * discipline; a doc whose every segment lost keeps the md5 of "").
    *
    * Shape: segment explode (narrow, codegen), ONE segment-keyed
    * aggregation for the first-occurrence argmin (min over a
    * (doc, idx) struct — partial-agg friendly, never a per-segment
    * window), one equi-join back, one per-doc agg whose ordered
    * rebuild runs over doc-bounded segment lists. A hot boilerplate
    * segment costs a combine tree, not a task. At 100 TB the segment
    * STRING key becomes an 8-byte hash (the [[shingleHashes]] move)
    * and the rebuild column is dropped unless re-materializing text. */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8): DataFrame = {
    require(window > 0)
    // tokenize ONCE into a row attribute before the per-segment lambda:
    // a `split` referenced inside `transform`'s lambda is re-evaluated
    // per ELEMENT (HOFs get no common-subexpression elimination — the
    // recorded q42 trap), turning an O(tokens) tokenize into
    // O(tokens·segments). seg_toks is arithmetic, not a second slice.
    val withToks = graft.GraftSession.widen(docs)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
    val nTok = size(col("__toks"))
    val nSeg = ceil(nTok / lit(window.toDouble)).cast("int")
    val segArr = transform(sequence(lit(0), greatest(nSeg, lit(1)) - 1), i =>
      struct(
        concat_ws(" ", slice(col("__toks"), i * window + 1, lit(window))).as("seg"),
        least(lit(window), nTok - i * window).as("seg_toks")))
    val seg = withToks
      .select(col(idCol), posexplode(segArr))
      .select(col(idCol), col("pos").as("seg_idx"),
        col("col.seg").as("seg"), col("col.seg_toks").as("seg_toks"))
    val first = seg.groupBy(col("seg"))
      .agg(min(struct(col(idCol), col("seg_idx"))).as("__first"))
    seg.join(first, "seg")
      .withColumn("keep",
        col(s"__first.$idCol") === col(idCol) &&
          col("__first.seg_idx") === col("seg_idx"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_seg"),
        sum(col("keep").cast("long")).as("n_kept"),
        coalesce(sum(when(col("keep"), col("seg_toks").cast("long"))), lit(0L))
          .as("kept_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("seg_idx"), col("seg"))))),
            s => s.getField("seg")),
          " ")).as("kept_md5"))
  }

  /** EXACT edit-distance near-dup pairs, sub-quadratic — the
    * character-level family member next to the token-level (Jaccard /
    * MinHash) and bit-level (SimHash / sign-code) ones: typo-grade
    * duplicates that shingle sets miss entirely. PassJoin-style
    * segment banding (Li, Deng, Feng, "PASS-JOIN", VLDB 2011):
    * if ed(s,t) ≤ k, the ≤ k edits touch at most k of s's k+1
    * segments, so at least one segment appears VERBATIM in t, start
    * shifted by at most k (the indels before it) — joining probe
    * segments against index substrings at the compatible
    * (segment, probe-length, ±k-start) slots is therefore COMPLETE
    * (pigeonhole-exact, no recall loss to the banding), and a final
    * `levenshtein` verify on candidates only makes the result the
    * exact ed ≤ k pair set.
    *
    * Operates on the `prefixLen`-char lowercased prefix (the
    * head-dup/typo-variant contract; full-string joins use the same
    * machinery with longer segments). Explode factors are constants:
    * k+1 probe rows and ≤ (k+1)(2k+1)² deduped index rows per string,
    * joined on (segment idx, text, probe length) — a banded equi-join
    * like every other family member, then exact verify on candidates. */
  def editNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 2, prefixLen: Int = 60): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist
    // prefixes shorter than k+1 chars would have EMPTY probe segments
    // and lose the pigeonhole guarantee (k edits could touch every
    // non-empty one) — excluded by contract, mirrored by the oracle
    val s = df.select(
      col(idCol).cast("long").as("id"),
      substring(lower(col(textCol)), 1, prefixLen).as("t"))
      .withColumn("len", length(col("t")))
      .filter(col("len") >= k + 1)
    val segIdx = explode(sequence(lit(0), lit(k))).as("i")
    // probe side: string s cut into k+1 segments by its own length
    // (last segment takes the remainder); Column./ is DOUBLE division,
    // so the integer cut is floor-cast (operands are positive)
    def idiv(plen: Column): Column = floor(plen / (k + 1)).cast("int")
    def segStart(i: Column, plen: Column) = i * idiv(plen) + 1
    def segLen(i: Column, plen: Column) =
      when(i === k, plen - lit(k) * idiv(plen)).otherwise(idiv(plen))
    val probeSegs = s.select(col("id"), col("t"), col("len"), segIdx)
      .select(col("id").as("pid"), col("i"), col("len").as("plen"),
        col("t").substr(segStart(col("i"), col("len")), segLen(col("i"), col("len")))
          .as("seg"))
      .filter(length(col("seg")) >= 1)
    // index side: for every (segment idx, hypothetical probe length
    // within ±k of this string's length, start shift within ±k), the
    // substring a matching probe segment would have to equal
    val index = s
      .select(col("id"), col("t"), col("len"), segIdx)
      .withColumn("dl", explode(sequence(lit(-k), lit(k))))
      .withColumn("plen", col("len") + col("dl"))
      .filter(col("plen") >= 1)
      .withColumn("ds", explode(sequence(lit(-k), lit(k))))
      .withColumn("start", segStart(col("i"), col("plen")) + col("ds"))
      .withColumn("slen", segLen(col("i"), col("plen")))
      .filter(col("start") >= 1 && col("slen") >= 1 &&
        col("start") + col("slen") - 1 <= col("len"))
      .select(col("id").as("iid"), col("i"), col("plen"),
        col("t").substr(col("start"), col("slen")).as("seg"))
      .distinct()
    val cand = probeSegs.join(index, Seq("i", "plen", "seg"))
      .filter(col("pid") =!= col("iid"))
      .select(least(col("pid"), col("iid")).as("id_a"),
        greatest(col("pid"), col("iid")).as("id_b"))
      .distinct()
    cand
      .join(s.select(col("id").as("id_a"), col("t").as("ta")), "id_a")
      .join(s.select(col("id").as("id_b"), col("t").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).as("dist"))
      .filter(col("dist") <= k)
  }
}
