package graft

import org.apache.spark.sql.functions._
import graft.api.{GraftVectors, VectorRecord}
import graft.operators.SkewJoin
import graft.sources.Tables

class ApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed facade: read -> dedup -> buildIndex -> search end to end") {
    val vecs = GraftVectors.readVec(spark, "/root/reference/data/test.vec", 300)
    assert(vecs.count() === 99) // fixture header lies (claims 100)
    val clean = GraftVectors.dedup(vecs)
    val model = GraftVectors.buildIndex(clean, numTrees = 10, maxLeafSize = 5)
    val res = GraftVectors.search(model, clean.limit(5), topK = 3).collect()
    assert(res.nonEmpty)
    res.groupBy(_.query_id).foreach { case (qid, ns) =>
      assert(ns.length <= 3)
      val self = ns.find(_.rank === 1).get
      assert(self.neighbor_id === qid && self.dist === 0.0)
    }
  }

  test("widen() is a zero-cost identity when spark.graft.widen.enabled=false") {
    val df = Tables.embeddings(spark, sf0001)
    spark.conf.set("spark.graft.widen.enabled", "false")
    try assert(GraftSession.widen(df) eq df) // no probe, no planning, same frame
    finally spark.conf.unset("spark.graft.widen.enabled")
    // default path still widens the single-split fixture scan
    assert(GraftSession.widen(df).rdd.getNumPartitions >=
      math.min(spark.sparkContext.defaultParallelism, df.count().toInt))
  }

  test("typed curation facade delegates to the specced operators") {
    import graft.api.{Document, GraftCuration}
    val docs = Tables.documents(spark, sf0001).as[Document]
    // near-dup pairs == the raw operator's pairs
    val typed = GraftCuration.nearDupPairs(docs).collect()
      .map(p => (p.id_a, p.id_b)).toSet
    val raw = graft.operators.TextDedup
      .minhashPairs(docs.toDF(), "doc_id", "text", 3, 32, 8, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(typed === raw && typed.nonEmpty)
    // weighted sample: k per group, rows are real documents
    val sampled = GraftCuration.weightedSample(docs, "lang", k = 3).collect()
    assert(sampled.groupBy(_.lang).forall(_._2.length <= 3))
    assert(sampled.forall(_.text.nonEmpty))
    // LM scores: bigram is order-sensitive, unigram row per doc
    assert(GraftCuration.lmScore(docs).count() === docs.count())
    val floor = GraftCuration.qualityFloor(docs, "lang", 0.5).count()
    assert(floor > 0 && floor < docs.count())
    // leakage-safe split: every doc assigned, clusters atomic
    val split = GraftCuration.leakageSafeSplit(docs).collect()
    assert(split.length === docs.count())
    assert(split.groupBy(_.cluster).values.forall(_.map(_.split).toSet.size == 1))
    // drift: one row per slice value, finite KL
    val dr = GraftCuration.drift(docs, "source").collect()
    assert(dr.map(_.slice).toSet === docs.collect().map(_.source).toSet)
    assert(dr.forall(r => !r.kl.isNaN && r.kl >= -1e-9))
    // BPE: facade training == operator training; bill covers every doc
    val merges = GraftCuration.trainBpe(docs, numMerges = 10)
    assert(merges === graft.operators.Bpe.fit(docs.toDF(), "text", 10))
    val bill = GraftCuration.tokenBill(docs, merges).collect()
    assert(bill.length === docs.count())
    assert(bill.forall(b => b.n_bpe >= b.n_words))
    // novelty vs self is 0 everywhere; deflate ratios are (0, 1]-ish
    val nov = GraftCuration.novelty(docs, docs).collect()
    assert(nov.length === docs.count())
    assert(nov.forall(_.getAs[Double]("novelty") === 0.0))
    val cr = GraftCuration.compressionRatio(docs).collect()
    assert(cr.length === docs.count())
    assert(cr.forall { r =>
      val x = r.getAs[Double]("deflate_ratio"); x > 0.0 && x < 1.5 })
    // normalize: idempotent on the ASCII fixture, n_chars recomputed
    val norm = GraftCuration.normalize(docs).collect()
    assert(norm.length === docs.count())
    assert(norm.forall(d => d.n_chars == d.text.length))
    // classifier: delegation equals the operator, one row per doc
    val cls = GraftCuration.classifierScores(docs,
      coalesce($"lang" === "en", lit(false))).collect()
    assert(cls.length === docs.count())
    val rawCls = graft.operators.TextAnalysis.nbClassifierScores(
        docs.toDF(), "doc_id", "text", coalesce($"lang" === "en", lit(false)))
      .as[graft.api.ClassifierScore].collect()
    assert(cls.sortBy(_.doc_id).toSeq === rawCls.sortBy(_.doc_id).toSeq)
    // snapshot diff of a drop against itself: all unchanged
    val selfDiff = GraftCuration.snapshotDiff(docs, docs).collect()
    assert(selfDiff.length === docs.count())
    assert(selfDiff.forall(_.status == "unchanged"))
    // triplets: typed face over the q145 composition
    val maxId = docs.collect().map(_.doc_id).max + 1
    val trips = GraftCuration.contrastiveTriplets(docs, maxId).collect()
    assert(trips.nonEmpty)
    assert(trips.forall(t => typed((math.min(t.anchor_id, t.pos_id),
      math.max(t.anchor_id, t.pos_id)))))
    // round-7 reporting faces: pii audit, temperature mix, quality sweep
    assert(GraftCuration.piiAudit(docs).columns.toSeq ===
      Seq("doc_id", "pii_type", "hit"))
    val mix = GraftCuration.temperatureMix(docs, "source", 0.7, 1000L).collect()
    assert(mix.map(_.getLong(3)).sum <= 1000L && mix.nonEmpty)
    val sweep = GraftCuration.qualitySweep(docs).collect()
    assert(sweep.length === 6)
    // round-8 faces: DSIR selection, diversity report, top-ngram rule
    val picks = GraftCuration.dsirSelect(
      docs.filter($"lang" =!= "es"), docs.filter($"lang" === "es"), k = 10)
      .collect()
    assert(picks.length === 10)
    assert(picks.map(_.log_w).toSeq === picks.map(_.log_w).sortBy(-_).toSeq)
    val div = GraftCuration.diversityReport(docs).collect()
    assert(div.nonEmpty && div.forall { r =>
      val r1 = r.getAs[Double]("ratio_1"); r1 > 0.0 && r1 <= 1.0 })
    val rep = GraftCuration.topNgramRepetition(docs).collect()
    assert(rep.nonEmpty && rep.forall { r =>
      val f = r.getAs[Double]("top_ngram_char_frac"); f > 0.0 && f <= 1.0 })
  }

  test("typed tokenize: decodes back to normalized text; chunks reassemble the stream") {
    import graft.api.{Document, GraftCuration}
    val docs = Tables.documents(spark, sf0001).as[Document].limit(30)
    val toks = GraftCuration.tokenize(docs).collect()
    assert(toks.length === 30)
    val textOf = docs.collect().map(d => d.doc_id -> d.text).toMap
    toks.foreach { t =>
      val normalized = textOf(t.doc_id).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(graft.operators.Bpe.decodeIds(t.token_ids, graft.BpeAssets.vocab)
        === normalized, s"doc ${t.doc_id}")
    }
    // chunking preserves order and content: concatenating a doc's
    // chunks in chunk_idx order reproduces its full id stream, and
    // every chunk except the last is exactly chunkLen long
    val chunks = GraftCuration.tokenizeChunked(docs, chunkLen = 16).collect()
      .groupBy(_.doc_id)
    toks.foreach { t =>
      val cs = chunks(t.doc_id).sortBy(_.chunk_idx)
      assert(cs.flatMap(_.token_ids).toSeq === t.token_ids.toSeq, s"doc ${t.doc_id}")
      cs.dropRight(1).foreach(c => assert(c.token_ids.length === 16))
      assert(cs.last.token_ids.nonEmpty && cs.last.token_ids.length <= 16)
    }
  }

  test("typed maxSimTopK: exact and refined agree; self-bag ranks first") {
    val recs = Tables.embeddings(spark, sf0001)
      .select($"vec_id".as("id"), concat(lit("w"), $"vec_id").as("word"), $"embedding")
      .as[VectorRecord]
    val group = floor(col("id") / 5).cast("long")
    val queries = recs.filter($"id" < 5)  // bag 0
    val exact = GraftVectors.maxSimTopK(recs, queries, group, k = 5).collect()
    val refined = GraftVectors.maxSimTopK(recs, queries, group, k = 5, candPerTok = 64).collect()
    assert(exact.sortBy(_.rank).toSeq === refined.sortBy(_.rank).toSeq)
    val top = exact.minBy(_.rank)
    assert(top.group_id === 0L && top.maxsim === 5.0)
  }

  test("typed filtered/radius/remove surface round-trips") {
    val recs = Tables.embeddings(spark, sf0001).limit(200)
      .select($"vec_id".as("id"), lit("w").as("word"), $"embedding")
      .as[graft.api.VectorRecord].cache()
    val model = GraftVectors.buildIndex(recs, numTrees = 20)
    // filtered: only even ids may be neighbors
    val filtered = GraftVectors.searchFiltered(
      model, recs, recs.limit(10), topK = 3, corpusFilter = $"id" % 2 === 0)
      .collect()
    assert(filtered.nonEmpty && filtered.forall(_.neighbor_id % 2 == 0))
    // radius: self match at dist 0 always present, all within threshold
    val radius = GraftVectors.searchRadius(model, recs, recs.limit(10), maxDist = 1.2535)
      .collect()
    assert(radius.count(m => m.query_id == m.neighbor_id && m.dist == 0.0) === 10)
    assert(radius.forall(_.dist <= 1.2535))
    // remove: deleted id gone from the standing index's serving
    val dModel = GraftVectors.buildIndexDistributed(recs, numTrees = 10)
    val pruned = GraftVectors.removeFromIndex(dModel, spark.range(3, 4).as[Long])
    val got = GraftVectors.searchDistributed(pruned, recs.limit(10), topK = 5).collect()
    assert(got.nonEmpty && !got.exists(_.neighbor_id == 3L))
  }

  test("typed knnJoin covers every input record") {
    val ds = Tables.embeddings(spark, sf0001).limit(100)
      .select($"vec_id".as("id"), lit("w").as("word"), $"embedding")
      .as[VectorRecord]
    val model = GraftVectors.buildIndex(ds, numTrees = 10)
    val res = GraftVectors.knnJoin(model, ds, topK = 5)
    assert(res.select("query_id").distinct().count() === 100)
  }

  test("typed knnSelfJoin covers every record on both backends, rank-1 dist 0") {
    val ds = Tables.embeddings(spark, sf0001).limit(100)
      .select($"vec_id".as("id"), lit("w").as("word"), $"embedding")
      .as[VectorRecord]
    val fm = GraftVectors.buildIndex(ds, numTrees = 10)
    val a = GraftVectors.knnSelfJoin(fm, ds, topK = 5)
    assert(a.select("query_id").distinct().count() === 100)
    assert(a.filter($"rank" === 1 && $"dist" === 0.0).count() === 100)
    val dm = GraftVectors.buildIndexDistributed(ds, numTrees = 10)
    val b = GraftVectors.knnSelfJoinDistributed(dm, topK = 5)
    assert(b.select("query_id").distinct().count() === 100)
    assert(b.filter($"rank" === 1 && $"dist" === 0.0).count() === 100)
  }

  test("typed facade: distributed build + search, self at rank 1") {
    val ds = Tables.embeddings(spark, sf0001).limit(100)
      .select($"vec_id".as("id"), lit("w").as("word"), $"embedding")
      .as[VectorRecord]
    val model = GraftVectors.buildIndexDistributed(ds, numTrees = 10)
    val res = GraftVectors.searchDistributed(model, ds.limit(10), topK = 3).collect()
    assert(res.nonEmpty)
    res.filter(_.rank == 1).foreach { n =>
      assert(n.neighbor_id === n.query_id && n.dist === 0.0)
    }
  }

  test("typed facade: appendToIndex grows the store; new records findable") {
    val ds = Tables.embeddings(spark, sf0001).limit(100)
      .select($"vec_id".as("id"), lit("w").as("word"), $"embedding")
      .as[VectorRecord]
    val model = GraftVectors.buildIndexDistributed(ds.filter($"id" < 80), numTrees = 10)
    val grown = GraftVectors.appendToIndex(model, ds.filter($"id" >= 80))
    val res = GraftVectors.searchDistributed(grown, ds.filter($"id" >= 80), topK = 1).collect()
    assert(res.nonEmpty)
    res.foreach(n => assert(n.neighbor_id === n.query_id))
  }

  test("salted join is result-equivalent to a plain inner join under skew") {
    // skewed: 90% of rows share one key
    val large = (0 until 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = (0L until 200L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = large.join(small, Seq("k")).select("k", "payload", "attr")
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", saltBuckets = 8)
      .select("k", "payload", "attr")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("SQL knn face: exact face == in-model brute, ANN face == model.search") {
    val e = Tables.embeddings(spark, sf0001)
    val model = graft.ann.AnnForest(numTrees = 10, maxLeafSize = 5, seed = 42L)
      .fit(e, "vec_id", "embedding")
    model.registerSql(spark, "t_knn", "t_knn_exact")
    e.createOrReplaceTempView("t_emb")
    def viaSql(fn: String) = spark.sql(
      s"""SELECT query_id, t.pos + 1 AS rank, t.h.neighbor_id, t.h.dist
          FROM (SELECT vec_id AS query_id, embedding AS qvec
                FROM t_emb WHERE vec_id < 10) q
          LATERAL VIEW posexplode($fn(qvec, 5)) t AS pos, h""")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def viaModel(f: Array[Float] => Array[(Long, Double)]) =
      qs.flatMap { case (qid, v) =>
        f(v).zipWithIndex.map { case ((id, d), i) => (qid, i + 1, id, d) }
      }.toSet
    assert(viaSql("t_knn_exact") === viaModel(model.compact.searchExact(_, 5)))
    assert(viaSql("t_knn") === viaModel(model.search(_, 5)))
    // and the exact face's rank-1 hit is the query itself at dist 0
    assert(viaSql("t_knn_exact").filter(_._2 == 1)
      .forall(h => h._1 == h._3 && h._4 == 0.0))
  }

  test("typed facade: curriculum, epoch schedule, edit near-dups, boilerplate strip") {
    import graft.api._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001).as[Document]
    val n = docs.count()
    val cur = GraftCuration.curriculum(docs, numPhases = 3)
    assert(cur.count() === n)
    assert(cur.filter($"phase" === 1).count() > 0)
    val sched = GraftCuration.epochSchedule(docs, numEpochs = 2)
    assert(sched.count() === 2 * n)
    val pairs = GraftCuration.editNearDups(docs.limit(50))
    assert(pairs.collect().forall(p => p.score <= 2.0 && p.id_a < p.id_b))
    val stripped = GraftCuration.stripBoilerplate(docs.limit(20)).collect()
    stripped.foreach(d => assert(d.n_chars === d.text.length.toLong))
  }

  test("typed facade: backoff score, chunking, domain classify") {
    import graft.api._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001).as[Document]
    val half = docs.filter($"doc_id" % 2 === 0)
    val other = docs.filter($"doc_id" % 2 =!= 0)
    val sc = GraftCuration.backoffScore(other, half).collect()
    assert(sc.nonEmpty)
    sc.foreach(s => assert(s.tri_frac >= 0.0 && s.tri_frac <= 1.0 && s.n > 0))
    val chunks = GraftCuration.chunk(docs, window = 16, stride = 12)
    // every doc chunked; every chunk non-larger than the window; the
    // per-doc max chunk reaches the doc's token count
    assert(chunks.select($"doc_id").distinct().count() === docs.count())
    assert(chunks.filter($"n_tokens" > 16).isEmpty)
    val preds = GraftCuration.classifyDomain(other.limit(30), half)
    assert(preds.count() === 30)
    preds.collect().foreach(p => assert(p.pred.startsWith("src")))
  }
}
