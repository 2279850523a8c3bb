package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup
import graft.sources.Tables

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001).cache()

  test("shingles produce n-grams; short docs fall back to whole text") {
    val df = Seq(("a b c d", 1), ("x", 2)).toDF("text", "id")
    val sh = df.select($"id", TextDedup.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(sh(1) === Seq("a b c", "b c d"))
    assert(sh(2) === Seq("x"))
  }

  test("jaccard is 1 for identical, 0 for disjoint sets") {
    val df = Seq((Seq(1L, 2L), Seq(1L, 2L), Seq(9L))).toDF("a", "b", "c")
    val r = df.select(
      TextDedup.jaccard($"a", $"b"), TextDedup.jaccard($"a", $"c")).head()
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 0.0)
  }

  test("minhash LSH finds all exact near-dup pairs at threshold 0.5 (full recall on fixture)") {
    val exact = TextDedup.jaccardPairsExact(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = TextDedup.minhashPairs(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // verify stage guarantees precision; banding should give full recall
    // on the fixture's high-jaccard planted pairs
    assert(lsh === exact, s"missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("minhashPairs resolves when the caller's id column is named \"id\"") {
    // regression: the verify-stage semi-join joins against an internal
    // frame whose column is "id" — an unqualified reference was
    // ambiguous for this (perfectly normal) caller schema
    val renamed = docs.select($"doc_id".as("id"), $"text")
    val viaId = TextDedup.minhashPairs(renamed, "id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val viaDocId = TextDedup.minhashPairs(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaId === viaDocId)
  }

  test("simhash: identical docs get identical fingerprints, near-dups small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox leaps over the lazy dog again and again"),
      (4L, "completely different content about spark query engines at scale")
    ).toDF("id", "text")
    val fps = df.select($"id", TextDedup.simhash($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) === fps(2L))
    assert(ham(fps(1L), fps(3L)) < ham(fps(1L), fps(4L)))
  }

  test("banded simhash pairs EQUAL the brute-force cross-join pair set") {
    val docs = Tables.documents(spark, sf0001)
    val fp = docs.select($"doc_id", TextDedup.simhash($"text", 2).as("fp"))
    val a = fp.select($"doc_id".as("id_a"), $"fp".as("fp_a"))
    val b = fp.select($"doc_id".as("id_b"), $"fp".as("fp_b"))
    val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("ham", TextDedup.hamming($"fp_a", $"fp_b"))
      .filter($"ham" <= 8)
      .select($"id_a", $"id_b", $"ham").as[(Long, Long, Long)].collect().toSet
    val banded = TextDedup.simhashPairsBanded(docs, "doc_id", "text", 2, 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === brute, "pigeonhole banding must be exact, not approximate")
    assert(brute.nonEmpty, "fixture must exercise the path")
  }

  test("banded simhash at maxHamming=0 degenerates to exact-fingerprint pairs") {
    val df = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val pairs = TextDedup.simhashPairsBanded(df, "doc_id", "text", 2, 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 0L)))
    // and the single 64-bit band is the WHOLE fingerprint, not a
    // zeroed mask that would collapse every doc into one bucket (the
    // 1L << 64 == 1L JVM shift trap): bval must equal fp itself
    val fp = df.select($"doc_id".as("id"), TextDedup.simhash($"text", 2).as("fp"))
    val bands = TextDedup.bandedFingerprints(fp, 0)
      .join(fp, Seq("id"))
      .select($"bval" === $"fp").as[Boolean].collect()
    assert(bands.nonEmpty && bands.forall(identity))
  }

  test("cosine near-dup pairs are symmetric-free (id_a < id_b) and thresholded") {
    val e = Tables.embeddings(spark, sf0001)
    val pairs = TextDedup.cosineNearDupPairs(e, "vec_id", "embedding", 0.4)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("contaminationPairs: containment hits at frac 1.0, disjoint docs absent") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different content about spark shuffles and joins"),
      (3L, "the quick brown fox appears here too")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps"), // ⊂ doc 1 (all three 3-grams)
      (101L, "unrelated benchmark text entirely")).toDF("doc_id", "text")
    val hits = TextDedup.contaminationPairs(train, bench, "doc_id", "text",
      ngram = 3, minFrac = 0.5).collect()
    val byPair = hits.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(byPair((1L, 100L)) === 1.0) // full containment
    assert(!byPair.contains((2L, 100L)))
    assert(hits.forall(_.getLong(1) != 101L)) // disjoint bench doc clean
  }

  test("contaminationPairsBloom ≡ contaminationPairs (no false negatives)") {
    // real corpus split, both thresholds and the df cap: the Bloom
    // prefilter must be invisible in the OUTPUT (false positives die in
    // the equi-join; survivors keep all their rows so df is unchanged)
    val docs = Tables.documents(spark, sf0001)
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    for ((frac, cap) <- Seq((0.4, 0), (0.5, 50))) {
      val exact = TextDedup.contaminationPairs(train, bench, "doc_id", "text",
        ngram = 3, minFrac = frac, maxShingleDf = cap)
        .orderBy("train_id", "bench_id").collect().toSeq
      val bloom = TextDedup.contaminationPairsBloom(train, bench, "doc_id", "text",
        ngram = 3, minFrac = frac, maxShingleDf = cap)
        .orderBy("train_id", "bench_id").collect().toSeq
      assert(bloom === exact)
      assert(exact.nonEmpty, "degenerate fixture: no contamination pairs at all")
    }
  }

  test("contaminationPairsBloom plan: narrow might_contain filter before the join") {
    val docs = Tables.documents(spark, sf0001)
    val plan = TextDedup.contaminationPairsBloom(
      docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(20)) === 0),
      "doc_id", "text", ngram = 3, minFrac = 0.4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "Bloom prefilter missing from the physical plan")
  }

  test("contaminationPairs maxShingleDf drops stop-phrase shingles") {
    // "the quick brown" occurs in 3 train docs → df cap 2 removes it,
    // and with it the only overlap with the bench doc
    val train = Seq(
      (1L, "the quick brown alpha"), (2L, "the quick brown beta"),
      (3L, "the quick brown gamma")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown")).toDF("doc_id", "text")
    val unCapped = TextDedup.contaminationPairs(train, bench, "doc_id", "text",
      ngram = 3, minFrac = 0.5, maxShingleDf = 0).count()
    val capped = TextDedup.contaminationPairs(train, bench, "doc_id", "text",
      ngram = 3, minFrac = 0.5, maxShingleDf = 2).count()
    assert(unCapped === 3L)
    assert(capped === 0L)
  }

  test("contrastive triplets: deterministic draw, symmetrized pairs, honest clean flag") {
    import graft.operators.Contrastive
    def draw(a: Long, p: Long, n: Long): Long =
      ((a % 1000003L) * 2654435761L + (p % 999983L) * 40503L
        + 2246822519L) % n
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val ids = spark.range(0, 10).toDF("doc_id")
    val out = Contrastive.tripletsFromPairs(pairs, ids, "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.length === 4) // both directions, all draws exist in 0..9
    out.foreach { case (a, p, n, _) => assert(n === draw(a, p, 10)) }

    // non-canonical input — both orientations AND duplicate rows — must
    // not duplicate triplets or fan out the cleanliness join
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L))
      .toDF("id_a", "id_b")
    val messyOut = Contrastive.tripletsFromPairs(messy, ids, "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(messyOut.sorted.toSeq === out.sorted.toSeq)

    // wide-domain draw (id spaces past the legacy 2.65e15 all-long
    // domain): the decimal MMIX mix, replayed locally with BigInt
    val bigMax = Long.MaxValue / 2
    def drawWide(a: Long, p: Long): Long =
      ((BigInt(a % 1000003L) * BigInt("6364136223846793005")
        + BigInt(p % 999983L) * 40503 + 2246822519L)
        mod BigInt(bigMax)).toLong
    val sym = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))
    val wideIds = (Seq(1L, 2L, 3L, 4L) ++ sym.map { case (a, p) => drawWide(a, p) })
      .toDF("doc_id")
    val wide = Contrastive.tripletsFromPairs(pairs, wideIds, "doc_id", bigMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(wide.length === 4)
    wide.foreach { case (a, p, n) => assert(n === drawWide(a, p), s"($a,$p)") }
    // draws past the legacy domain are actually reachable
    assert(wide.exists(_._3 > 2650000000000000L))

    // full-fixture run: flags must equal a local recomputation from the
    // collected pair set, and every negative must exist in the corpus
    val real = TextDedup.minhashPairs(docs, "doc_id", "text",
      ngram = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val posSet = (real.map(t => (t._1, t._2)) ++ real.map(t => (t._2, t._1))).toSet
    val maxId = docs.agg(max($"doc_id")).head().getLong(0) + 1
    val trips = Contrastive.tripletsFromPairs(
        real.toSeq.toDF("id_a", "id_b"), docs, "doc_id", maxId)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(trips.nonEmpty)
    val docIds = docs.select($"doc_id").as[Long].collect().toSet
    trips.foreach { case (a, p, n, clean) =>
      assert(posSet((a, p)), "triplet not from the pair set")
      assert(docIds(n), "negative must exist in the corpus")
      val wantClean = if (n == a || posSet((a, n))) 0 else 1
      assert(clean === wantClean, s"flag wrong for ($a,$p,$n)")
    }
  }

  test("novelty: 0 inside the reference, 1 when disjoint, fractional when mixed") {
    val ref = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "alpha beta gamma delta"),      // reference member -> 0.0
      (10L, "zeta eta theta iota kappa"),  // disjoint -> 1.0
      // shares shingle "alpha beta gamma", adds 2 novel of 3 total
      (11L, "alpha beta gamma zeta eta")
    ).toDF("doc_id", "text")
    val out = TextDedup.noveltyVsReference(docs, ref, "doc_id", "text", ngram = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L) === ((2L, 0.0)))   // "alpha beta gamma", "beta gamma delta"
    assert(out(10L) === ((3L, 1.0)))
    assert(out(11L)._1 === 3L)
    assert(math.abs(out(11L)._2 - 2.0 / 3) < 1e-6)
  }

  test("removeDupSpans keeps the corpus-wide first occurrence of a repeated segment") {
    // window=2 segments: doc 0 = [a b][c d], doc 1 = [a b][x y],
    // doc 2 = [c d][a b][z] — "a b" survives only in doc 0 seg 0,
    // "c d" only in doc 0 seg 1, uniques survive everywhere.
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b x y"),
      (2L, "c d a b z")).toDF("doc_id", "text")
    val out = TextDedup.removeDupSpans(docs, "doc_id", "text", window = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    def md5(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(0L) === ((2L, 2L, 4L, md5("a b c d"))))
    assert(out(1L) === ((2L, 1L, 2L, md5("x y"))))
    assert(out(2L) === ((3L, 1L, 1L, md5("z"))))
    // a doc whose every segment is a repeat keeps md5("")
    val dup = Seq((0L, "p q"), (1L, "p q")).toDF("doc_id", "text")
    val gone = TextDedup.removeDupSpans(dup, "doc_id", "text", window = 2)
      .filter($"doc_id" === 1L).head()
    assert(gone.getLong(2) === 0L && gone.getString(4) === md5(""))
    // within one doc, an intra-doc repeat also keeps only its first copy
    val intra = Seq((5L, "m n m n o")).toDF("doc_id", "text")
    val r = TextDedup.removeDupSpans(intra, "doc_id", "text", window = 2).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 2L, 3L)))
    assert(r.getString(4) === md5("m n o"))
  }

  test("banded sign-code near-dup: pigeonhole boundary at ham 7 vs 8") {
    import org.apache.spark.sql.functions.{col, element_at}
    def v(flips: Int): Array[Float] =
      Array.tabulate(64)(i => if (i < flips) -1f else 1f)
    val emb = Seq((0L, v(0)), (1L, v(7)), (2L, v(8)))
      .toDF("vec_id", "embedding")
    val fp = emb.select(col("vec_id").as("id"),
      element_at(graft.functions.VectorFunctions.signPack(col("embedding")), 1)
        .as("fp"))
    val got = TextDedup.simhashPairsBandedFp(fp, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 0-1: ham 7 (included, exactly at the bound); 1-2: ham 1;
    // 0-2: ham 8 — excluded by the threshold, NOT by a missed band
    assert(got === Set((0L, 1L, 7), (1L, 2L, 1)))
  }

  test("hard negatives: labels respected, margin vs hand-built geometry, no self-pairs") {
    import org.apache.spark.sql.functions.col
    // axis-aligned geometry: label 0 near x-axis, label 1 near y-axis;
    // anchor 0 = (1, 0). Nearest same-label = 1 (cos .9806 highest in
    // label 0), hardest negative = 3 (the y-ish vector leaning to x).
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(5f, 1f), 0), (2L, Array(1f, 1f), 0),
      (3L, Array(1f, 2f), 1), (4L, Array(0f, 1f), 1), (5L, Array(-1f, 4f), 1)
    ).toDF("vec_id", "embedding", "label")
    val anchors = emb.filter(col("vec_id") === 0)
    val got = graft.operators.Contrastive.hardNegatives(emb, anchors, k = 2)
      .orderBy(col("rank")).collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(3L, 4L), "negative ranking")
    assert(got.forall(_.getLong(2) != 0L), "self excluded")
    // pos1 = id 1: cos = 5/sqrt(26); neg1 = id 3: cos = 1/sqrt(5)
    val margin = got.head.getDouble(4)
    val want = 5.0 / math.sqrt(26) - 1.0 / math.sqrt(5)
    assert(math.abs(margin - (math.rint(want * 1e4) / 1e4)) < 1e-9, s"margin $margin")
    // an anchor whose label has no other member: margin is NULL, negatives still rank
    val lone = emb.filter(col("vec_id") === 5).withColumn("label", col("label") * 0 + 7)
    val g2 = graft.operators.Contrastive
      .hardNegatives(emb.filter(col("vec_id") =!= 5).unionByName(lone), lone, k = 2)
      .collect()
    assert(g2.length === 2 && g2.forall(_.isNullAt(4)), "lone-label margin must be NULL")
  }

  test("editNearDupPairs: hand-built edits found exactly, banding is complete vs brute") {
    val base = "the quick brown fox jumps over the lazy dog again and"
    val rows = Seq(
      (1L, base),
      (2L, base.updated(10, 'X').toString),                 // 1 substitution
      (3L, base.substring(0, 5) + base.substring(6)
        + "Q"),                                             // 1 deletion + 1 append = ed 2
      (4L, "completely different content here with nothing shared at"),
      (5L, base.updated(3, 'A').updated(20, 'B').updated(40, 'C').toString) // ed 3
    ).toDF("doc_id", "text")
    val got = TextDedup.editNearDupPairs(rows, "doc_id", "text", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // brute truth over the same prefix contract
    val brute = {
      val ts = rows.collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.take(60)).toMap
      (for {
        a <- ts.keys; b <- ts.keys if a < b
        d = levenshteinDist(ts(a), ts(b)) if d <= 2
      } yield (a, b, d)).toSet
    }
    assert(got === brute)
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 3L, 2)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("editNearDupPairs: fixture + typo'd copies, banded == brute (completeness at scale)") {
    val sub = docs.filter($"doc_id" < 200)
    // two jitter families: substitutions (ds=0 banding) and a single
    // deletion (tail shift exercises the ±k start slots; its prefix-60
    // edit distance is 2 — the deletion plus the char the shift pulls
    // across the truncation boundary)
    val jitSub = sub.filter($"doc_id" % 2 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"),
        concat(substring($"text", 1, 2), lit("x"), substring($"text", 4, 7),
          lit("q"), substring($"text", 12, 1000000)).as("text"))
    val jitDel = sub.filter($"doc_id" % 2 === 1)
      .select(($"doc_id" + 100000L).as("doc_id"),
        concat(substring($"text", 1, 6), substring($"text", 8, 1000000)).as("text"))
    val corpus = sub.select($"doc_id", $"text")
      .unionByName(jitSub).unionByName(jitDel).cache()
    val got = TextDedup.editNearDupPairs(corpus, "doc_id", "text", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val ts = corpus.select($"doc_id", lower(substring($"text", 1, 60)))
      .as[(Long, String)].collect().filter(_._2.length >= 3)
    val brute = (for {
      (a, ta) <- ts; (b, tb) <- ts if a < b && math.abs(ta.length - tb.length) <= 2
      d = levenshteinDist(ta, tb) if d <= 2
    } yield (a, b, d)).toSet
    assert(got === brute)
    assert(got.size >= sub.count() * 9 / 10, "every typo'd copy pairs with its base")
  }

  /** Reference Levenshtein for the spec's brute side. */
  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }
}
