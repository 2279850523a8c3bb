package graft

import org.apache.spark.sql.functions._
import graft.functions.RandomProjection
import graft.operators.{SemanticDedup, TextDedup, UnigramLm}
import graft.sources.Tables

/** Round-5 curation operators: unigram-LM scoring, duplicated-span
  * metrics, sparse random projection, SemDeDup. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001).cache()
  lazy val embs = Tables.embeddings(spark, sf0001).cache()

  // ---- UnigramLm ----

  test("unigram logprob: hand-computed corpus") {
    // corpus tokens: a a a b  →  p(a)=3/4, p(b)=1/4
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val r = UnigramLm.score(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L) === ((3L, BigDecimal(math.log(0.75)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(r(2L) === ((1L, BigDecimal(math.log(0.25)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("unigram logprob: OOV tokens drop from the mean on a reference corpus") {
    val ref = Seq((1L, "a b")).toDF("doc_id", "text")
    val scored = UnigramLm.scoreAgainst(Seq((9L, "a zzz")).toDF("doc_id", "text"), ref)
      .collect().head
    // only "a" scores (p = 1/2); zzz is OOV and dropped
    assert(scored.getLong(1) === 1L)
    assert(math.abs(scored.getDouble(2) - math.log(0.5)) < 1e-4)
  }

  // ---- bigram LM ----

  test("bigram logprob: hand-computed interpolated scores") {
    // corpus: d1 = "a b a b" (bigrams ab, ba, ab), d2 = "b a" (ba)
    // bc: ab→2, ba→2; pc: a→2, b→2; uc: a→3, b→3; total = 6.
    // every position: ln(0.7·2/2 + 0.3·3/6) = ln(0.85)
    val df = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val expected = BigDecimal(math.log(0.85))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = UnigramLm.bigramScore(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) === ((3L, expected)))
    assert(r(2L) === ((1L, expected)))
  }

  test("bigram logprob: single-token docs contribute no bigrams and drop out") {
    val df = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val ids = UnigramLm.bigramScore(df).select($"doc_id").as[Long].collect()
    assert(ids.toSet === Set(1L))
  }

  test("bigram model penalizes shuffled word order where the unigram model cannot") {
    // reference = fluent corpus; probe doc reuses the same words in an
    // order the reference never produces. Unigram scores are identical
    // (same bag of words); the bigram score must drop.
    val ref = Seq.tabulate(20)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val fluent = Seq((100L, "the cat sat on the mat")).toDF("doc_id", "text")
    val shuffled = Seq((200L, "mat the on sat cat the")).toDF("doc_id", "text")
    val uniF = UnigramLm.scoreAgainst(fluent, ref).collect().head.getDouble(2)
    val uniS = UnigramLm.scoreAgainst(shuffled, ref).collect().head.getDouble(2)
    assert(uniF === uniS, "unigram model is order-blind by construction")
    val biF = UnigramLm.bigramScoreAgainst(fluent, ref).collect().head.getDouble(2)
    val biS = UnigramLm.bigramScoreAgainst(shuffled, ref).collect().head.getDouble(2)
    assert(biF > biS, s"fluent $biF must outscore shuffled $biS under the bigram model")
  }

  // ---- trigram stupid backoff ----

  test("stupid backoff: each tier hand-computed against Brants' formula") {
    // reference "a b c a b d": c3(abc)=c3(bca)=c3(cab)=c3(abd)=1;
    // c2: ab→2 bc→1 ca→1 bd→1; c1: a=2 b=2 c=1 d=1, total 6.
    val ref = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    def score(text: String): (Long, Double, Double) = {
      val r = UnigramLm.trigramStupidBackoff(
        Seq((9L, text)).toDF("doc_id", "text"), ref).collect().head
      (r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // tier 1 (trigram seen): s = c3(abc)/c2(ab) = 1/2
    assert(score("a b c") === ((1L, 1.0, r4(math.log(1.0 / 2)))))
    // tier 2 (trigram unseen, bigram seen): s = α·c2(bc)/c1(b) = 0.4·1/2
    assert(score("b b c") === ((1L, 0.0, r4(math.log(0.4 * 1 / 2)))))
    // tier 3 (both unseen, cur in-vocab): s = α²·c1(a)/total — the
    // SAME left-associated double arithmetic the Column tree folds
    assert(score("b b a") === ((1L, 0.0, r4(math.log(0.4 * 0.4 * 2 / 6)))))
    // mixed doc: (c,a,b) resolves at tier 1 with s=1, (a,b,c) at 1/2
    assert(score("c a b c") ===
      ((2L, 1.0, r4((math.log(1.0) + math.log(1.0 / 2)) / 2))))
  }

  test("stupid backoff: OOV current token and short docs drop, context-OOV backs off") {
    val ref = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val probe = Seq(
      (10L, "a b zzz"),   // cur OOV at the only position → doc drops
      (11L, "a b"),       // no trigram position → drops
      (12L, "zzz zzz a")  // OOV CONTEXT, in-vocab cur → tier 3 serves it
    ).toDF("doc_id", "text")
    val out = UnigramLm.trigramStupidBackoff(probe, ref).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet === Set(12L))
    assert(out(12L) === 0.0, "OOV context cannot resolve above tier 3")
  }

  // ---- dupShingleStats ----

  test("dup spans: duplicated shingles across docs detected, self-only shingles not") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown cat sits"),
      (3L, "entirely different words here")).toDF("doc_id", "text")
    val r = TextDedup.dupShingleStats(df, "doc_id", "text", 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // docs 1/2 share exactly the shingle "the quick brown"
    assert(r(1L) === ((3L, 1L)))
    assert(r(2L) === ((3L, 1L)))
    assert(r(3L) === ((2L, 0L)))
  }

  test("dup spans: fixture docs with near-dup pairs have nonzero dup ratio") {
    val pairs = TextDedup.jaccardPairsExact(docs, "doc_id", "text", 3, 0.5)
      .select(explode(array($"id_a", $"id_b")).as("doc_id")).distinct()
    val stats = TextDedup.dupShingleStats(docs, "doc_id", "text", 3)
    val zeroAmongPaired = stats.join(pairs, "doc_id")
      .filter($"n_dup_shingles" === 0L).count()
    assert(pairs.count() > 0)
    assert(zeroAmongPaired === 0, "a doc with a >0.5-Jaccard partner must share spans")
  }

  test("unigram logprob bounds: always ≤ 0; all-modal-token docs score highest (random corpora)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val vocab = (0 until 20).map(i => s"t$i")
      val corpus = (0L until 40L).map { id =>
        (id, Seq.fill(rng.nextInt(20) + 1)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val scored = UnigramLm.score(df)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(scored.values.forall(_ <= 0.0), "ln p ≤ 0 always")
      // a doc of only the modal token must score ≥ every other doc
      val toks = corpus.flatMap(_._2.split(" "))
      val modal = toks.groupBy(identity).maxBy { case (t, xs) => (xs.size, t) }._1
      val pure = corpus.filter(_._2.split(" ").forall(_ == modal)).map(_._1)
      pure.foreach { id =>
        assert(scored(id) >= scored.values.max - 1e-9, s"pure-modal doc $id not maximal")
      }
    }
  }

  // ---- Bm25 ----

  test("bm25: hand-computed two-doc corpus") {
    val df = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val terms = Seq("a", "zzz").toDF("term") // zzz matches nothing
    val r = graft.operators.Bm25.score(df, terms).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r.keySet === Set(1L)) // doc 2 matches no term → absent
    val (nMatched, score) = r(1L)
    assert(nMatched === 1L)
    // N=2, avgdl=2.5, tf=2, dl=3, df=1, k1=1.2, b=0.75
    val idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    val expected = idf * (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.5))
    assert(math.abs(score - expected) < 1e-12, s"$score vs $expected")
  }

  test("bm25 standing index: bucket-pruned serving scores equal the ad-hoc path") {
    import graft.operators.Bm25
    val docsDf = docs.select($"doc_id", $"text")
    Bm25.buildIndex(docsDf, "graft_bm25_idx", buckets = 8)
    try {
      val qTerms = docs.filter($"doc_id" === 0)
        .select(explode(slice(graft.operators.TextAnalysis.tokens($"text"), 1, 5)).as("t"))
        .as[String].collect().toSeq
      val indexed = Bm25.scoreIndexed(spark, "graft_bm25_idx", qTerms)
      // the serving win: the postings scan reads only the terms' buckets
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"), plan)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val adhoc = rows(Bm25.score(docsDf, qTerms.toDF("term")))
      val idx = rows(indexed)
      assert(adhoc.length === idx.length && adhoc.nonEmpty)
      // shared weight formula, same inputs — only the per-doc sum order
      // may differ between the two plans
      adhoc.zip(idx).foreach { case ((d1, n1, s1), (d2, n2, s2)) =>
        assert(d1 === d2 && n1 === n2 && math.abs(s1 - s2) < 1e-9, s"doc $d1")
      }
    } finally {
      Seq("postings", "terms", "doclens", "stats", "tombstones").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_bm25_idx_$t"))
    }
  }

  test("describeIndex tracks the delete/compact lifecycle") {
    import graft.operators.Bm25
    val docsDf = docs.select($"doc_id", $"text")
    Bm25.buildIndex(docsDf, "graft_bm25_desc", buckets = 8)
    def stats() = Bm25.describeIndex(spark, "graft_bm25_desc").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = stats()
    val n = docsDf.count()
    assert(fresh("n_docs_indexed") === n && fresh("n_docs_live") === n
      && fresh("n_docs_tombstoned") === 0L)
    assert(fresh("n_postings") > fresh("n_terms"))
    Bm25.removeDocs(spark, "graft_bm25_desc", Seq(1L, 2L, 3L).toDF("doc_id"))
    val afterDel = stats()
    assert(afterDel("n_docs_tombstoned") === 3L)
    assert(afterDel("n_docs_live") === n - 3)
    assert(afterDel("n_docs_indexed") === n, "tombstones do not shrink the physical index")
    // tombstoning a never-indexed id is a no-op in the stats too:
    // live + tombstoned stays == indexed and the ratio can't inflate
    Bm25.removeDocs(spark, "graft_bm25_desc", Seq(987654321L).toDF("doc_id"))
    val phantom = stats()
    assert(phantom("n_docs_tombstoned") === 3L && phantom("n_docs_live") === n - 3)
    Bm25.compactIndex(spark, "graft_bm25_desc", buckets = 8)
    val compacted = stats()
    assert(compacted("n_docs_indexed") === n - 3 && compacted("n_docs_live") === n - 3
      && compacted("n_docs_tombstoned") === 0L, "compaction makes live physical")
  }

  test("bm25 standing index: delete serves as if never indexed; compaction preserves scores") {
    import graft.operators.Bm25
    val docsDf = docs.select($"doc_id", $"text")
    Bm25.buildIndex(docsDf, "graft_bm25_del", buckets = 8)
    try {
      val qTerms = docs.filter($"doc_id" === 0)
        .select(explode(slice(graft.operators.TextAnalysis.tokens($"text"), 1, 5)).as("t"))
        .as[String].collect().toSeq
      val victims = Seq(1L, 2L, 3L, 4L, 5L)
      Bm25.removeDocs(spark, "graft_bm25_del", victims.toDF("doc_id"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      // ground truth: the ad-hoc scorer over the surviving documents —
      // df, N, and avgdl all shift, not just the victims' own rows
      val adhoc = rows(Bm25.score(
        docsDf.filter(!$"doc_id".isin(victims: _*)), qTerms.toDF("term")))
      val indexed = rows(Bm25.scoreIndexed(spark, "graft_bm25_del", qTerms))
      assert(indexed.length === adhoc.length && indexed.nonEmpty)
      assert(!indexed.exists(r => victims.contains(r._1)))
      indexed.zip(adhoc).foreach { case ((d1, n1, s1), (d2, n2, s2)) =>
        assert(d1 === d2 && n1 === n2 && math.abs(s1 - s2) < 1e-9, s"doc $d1")
      }
      // deleting an id the index never held is a no-op
      Bm25.removeDocs(spark, "graft_bm25_del", Seq(999999L).toDF("doc_id"))
      assert(rows(Bm25.scoreIndexed(spark, "graft_bm25_del", qTerms)).length === indexed.length)
      // compaction drops tombstones physically; scores unchanged
      Bm25.compactIndex(spark, "graft_bm25_del", buckets = 8)
      assert(!spark.catalog.tableExists("graft_bm25_del_tombstones"))
      val compacted = rows(Bm25.scoreIndexed(spark, "graft_bm25_del", qTerms))
      compacted.zip(indexed).foreach { case ((d1, n1, s1), (d2, n2, s2)) =>
        assert(d1 === d2 && n1 === n2 && math.abs(s1 - s2) < 1e-9, s"doc $d1")
      }
    } finally {
      Seq("postings", "terms", "doclens", "stats", "tombstones").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_bm25_del_$t"))
    }
  }

  test("bm25 standing index: torn rebuild refuses to serve; stale location rebuilds; old layout fails fast") {
    import graft.operators.Bm25
    val docsDf = docs.select($"doc_id", $"text").limit(50)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val hconf = spark.sparkContext.hadoopConfiguration
    def path(s: String) = new org.apache.hadoop.fs.Path(wh, s)
    val fs = path("x").getFileSystem(hconf)
    try {
      // stale-location scenario: a prior JVM's table directory survives
      // in the warehouse while this session's catalog has never heard of
      // the table — buildIndex must replace it, not die on
      // LOCATION_ALREADY_EXISTS (the exact failure that silently dropped
      // q84 from the round-5 gate)
      fs.mkdirs(path("graft_bm25_torn_postings"))
      fs.create(path("graft_bm25_torn_postings/junk"), true).close()
      Bm25.buildIndex(docsDf, "graft_bm25_torn", buckets = 4)
      val qTerms = docs.filter($"doc_id" === 0)
        .select(explode(slice(graft.operators.TextAnalysis.tokens($"text"), 1, 3)).as("t"))
        .as[String].collect().toSeq
      assert(Bm25.scoreIndexed(spark, "graft_bm25_torn", qTerms).collect().nonEmpty)
      // torn rebuild: the build-in-progress marker refuses serving and
      // compaction with an actionable message
      fs.create(path("graft_bm25_torn__building"), true).close()
      val e = intercept[IllegalArgumentException](
        Bm25.scoreIndexed(spark, "graft_bm25_torn", qTerms))
      assert(e.getMessage.contains("buildIndex"), e.getMessage)
      val e2 = intercept[IllegalArgumentException](
        Bm25.compactIndex(spark, "graft_bm25_torn"))
      assert(e2.getMessage.contains("buildIndex"), e2.getMessage)
      // a rebuild clears the marker and serves again
      Bm25.buildIndex(docsDf, "graft_bm25_torn", buckets = 4)
      assert(!fs.exists(path("graft_bm25_torn__building")))
      assert(Bm25.scoreIndexed(spark, "graft_bm25_torn", qTerms).collect().nonEmpty)
      // pre-(sum_dl, doclens) layout: fail fast with the remedy, not an
      // unresolved-column analysis error mid-plan
      graft.sources.Sinks.parquetTable(
        Seq((50L, 10.0)).toDF("n_docs", "avgdl"), "graft_bm25_torn_stats")
      val e3 = intercept[IllegalArgumentException](
        Bm25.scoreIndexed(spark, "graft_bm25_torn", qTerms))
      assert(e3.getMessage.contains("rerun buildIndex"), e3.getMessage)
    } finally {
      fs.delete(path("graft_bm25_torn__building"), false)
      Seq("postings", "terms", "doclens", "stats", "tombstones").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_bm25_torn_$t"))
    }
  }

  test("bm25 indexed batch: equals per-query indexed serving, deletes applied") {
    import graft.operators.Bm25
    val docsDf = docs.select($"doc_id", $"text")
    Bm25.buildIndex(docsDf, "graft_bm25_bi", buckets = 8)
    try {
      Bm25.removeDocs(spark, "graft_bm25_bi", Seq(1L, 2L, 3L).toDF("doc_id"))
      val queries = docs.filter($"doc_id".isin(0, 4))
        .select($"doc_id".as("query_id"),
          explode(slice(graft.operators.TextAnalysis.tokens($"text"), 1, 5)).as("term"))
      val batch = Bm25.scoreIndexedBatch(spark, "graft_bm25_bi", queries)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(batch.nonEmpty && !batch.keys.exists(k => Seq(1L, 2L, 3L).contains(k._2)))
      for (qid <- Seq(0L, 4L)) {
        val terms = queries.filter($"query_id" === qid)
          .select($"term").as[String].collect().toSeq
        val single = Bm25.scoreIndexed(spark, "graft_bm25_bi", terms)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        val mine = batch.collect { case ((q, d), v) if q == qid => d -> v }
        assert(mine.keySet === single.keySet, s"query $qid doc sets differ")
        mine.foreach { case (d, (n, s)) =>
          val (n2, s2) = single(d)
          assert(n === n2 && math.abs(s - s2) < 1e-9, s"query $qid doc $d")
        }
      }
    } finally {
      Seq("postings", "terms", "doclens", "stats", "tombstones").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_bm25_bi_$t"))
    }
  }

  test("bm25 batch: per-query scores equal the single-query path") {
    import graft.operators.Bm25
    val docsDf = docs.select($"doc_id", $"text")
    val queries = docs.filter($"doc_id".isin(0, 1))
      .select($"doc_id".as("query_id"),
        explode(slice(graft.operators.TextAnalysis.tokens($"text"), 1, 5)).as("term"))
    val batch = Bm25.scoreBatch(docsDf, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    for (qid <- Seq(0L, 1L)) {
      val single = Bm25.score(docsDf, queries.filter($"query_id" === qid).select($"term"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val mine = batch.collect { case ((q, d), v) if q == qid => d -> v }
      assert(mine.keySet === single.keySet, s"query $qid doc sets differ")
      mine.foreach { case (d, (n, s)) =>
        val (n2, s2) = single(d)
        assert(n === n2 && math.abs(s - s2) < 1e-9, s"query $qid doc $d")
      }
    }
  }

  test("bm25: rarer matched term outweighs common one at equal tf/dl") {
    // 4 docs; "rare" in 1 doc, "common" in 3 — idf monotonicity
    val df = Seq(
      (1L, "rare x y"), (2L, "common x y"), (3L, "common y z"), (4L, "common z w"))
      .toDF("doc_id", "text")
    val terms = Seq("rare", "common").toDF("term")
    val scores = graft.operators.Bm25.score(df, terms).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(scores(1L) > scores(2L))
  }

  // ---- RandomProjection ----

  test("sign matrix: deterministic, roughly 1/3 nonzero, balanced signs") {
    val m = RandomProjection.signMatrix(16, 64)
    assert(m === RandomProjection.signMatrix(16, 64))
    val flat = m.flatten
    val nonzero = flat.count(_ != 0)
    assert(nonzero > flat.length / 5 && nonzero < flat.length / 2,
      s"nonzero fraction ${nonzero.toDouble / flat.length} outside (0.2, 0.5)")
    val pos = flat.count(_ == 1); val neg = flat.count(_ == -1)
    assert(math.abs(pos - neg) < flat.length / 8, s"signs unbalanced: +$pos vs -$neg")
  }

  test("projection matches a naive per-row reference computation") {
    val rows = embs.limit(5).select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val projected = embs.limit(5)
      .select($"vec_id", RandomProjection.project($"embedding", 64, 8).as("y"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val m = RandomProjection.signMatrix(8, 64)
    val scale = math.sqrt(3.0 / 8)
    for ((id, v) <- rows; k <- 0 until 8) {
      var acc = 0.0
      for (j <- 0 until 64) if (m(k)(j) != 0) acc += m(k)(j) * v(j).toDouble
      assert(projected(id)(k) === acc * scale, s"vec $id lane $k")
    }
  }

  test("JL property: mean squared-norm ratio near 1 at dOut=16 on the fixture") {
    val ratios = embs
      .select(
        aggregate(transform($"embedding", x => x * x), lit(0.0d), (a, x) => a + x).as("orig"),
        aggregate(RandomProjection.project($"embedding", 64, 16), lit(0.0d),
          (a, x) => a + x * x).as("proj"))
      .select(($"proj" / $"orig").as("r")).as[Double].collect()
    val mean = ratios.sum / ratios.length
    // E[ratio] = 1 under the Achlioptas scaling; fixed seed ⇒ deterministic
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
  }

  // ---- typed facade ----

  test("GraftVectors.project and semanticDedup operate on the typed surface") {
    import graft.api.{GraftVectors, VectorRecord}
    val recs = embs.limit(50)
      .select($"vec_id".as("id"), concat(lit("w"), $"vec_id").as("word"), $"embedding")
      .as[VectorRecord]
    val projected = GraftVectors.project(recs, 64, 16).collect()
    assert(projected.length === 50 && projected.forall(_.embedding.length === 16))
    val kept = GraftVectors.semanticDedup(recs, threshold = 0.4, nlist = 4)
    assert(kept.collect().forall(_.embedding.length === 64))
    assert(kept.count() <= 50)
  }

  // ---- SemanticDedup ----

  test("semantic dedup: deterministic, partitions the corpus, survivors non-similar") {
    // q33's near-dup threshold on the synthetic fixture: cos ≥ 0.4
    // pairs exist (59 at sf0.01), so the dedup actually drops rows and
    // the assertions below are non-vacuous
    val τ = 0.4
    val s1 = SemanticDedup.survivors(embs, "vec_id", "embedding", τ, nlist = 8)
      .select($"vec_id").as[Long].collect().toSet
    val s2 = SemanticDedup.survivors(embs, "vec_id", "embedding", τ, nlist = 8)
      .select($"vec_id").as[Long].collect().toSet
    assert(s1 === s2, "seeded quantizer must make dedup deterministic")
    val n = embs.count()
    assert(s1.size.toLong <= n && s1.nonEmpty)

    // no two survivors in the same cell may still be τ-similar: such a
    // pair would be one component, of which only the min id survives
    val pairs = SemanticDedup.cellPairs(embs, "vec_id", "embedding", τ, nlist = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val survivingPairs = pairs.filter { case (a, b) => s1(a) && s1(b) }
    assert(survivingPairs.isEmpty, s"τ-similar survivor pairs: ${survivingPairs.take(5).toSeq}")

    // every dropped row is τ-similar (within its cell) to at least one row
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val droppedIds = embs.select($"vec_id").as[Long].collect().toSet -- s1
    assert(droppedIds.subsetOf(inPairs), "a dropped row must appear in a near-dup pair")
  }
}
