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

  /** Distinct 64-bit shingle hashes (the set representation). */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(shingles(text, n), s => xxhash64(s)))

  /** MinHash signature: k independent hash "permutations"
    * h_i(x) = xxhash64(seed_i, x), min per permutation over the shingle
    * hashes. Pure column expressions (one `array_min∘transform` per
    * permutation), codegen'd, and ANSI-safe — no modular multiply that
    * would overflow LONG under ansi mode.
    */
  def minhashSignature(hashes: Column, k: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val seeds = Seq.fill(k)(rng.nextLong())
    array(seeds.map { s =>
      array_min(transform(hashes, h => xxhash64(lit(s), h)))
    }: _*)
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
    val withSh = docs.select(
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
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = docs.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), ngram).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
      .withColumn("band", explode(lshBands(col("sig"), bands, r)))
      .select(col("id"), col("sh"), col("band.band_id"), col("band.band_key"))
    val l = sig.select(col("band_id"), col("band_key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val rr = sig.select(col("band_id"), col("band_key"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(rr, Seq("band_id", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b") // same pair can collide in several bands
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

  /** Embedding-cosine near-duplicate pairs (brute force over a blocking
    * key or all pairs; ANN/LSH is the scale path — see AnnForestModel). */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
