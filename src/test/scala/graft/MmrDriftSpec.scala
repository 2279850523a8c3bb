package graft

import org.apache.spark.sql.functions._
import graft.operators.{Drift, Mmr}

class MmrDriftSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("MMR skips a near-duplicate that pure top-k would keep") {
    // v1/v2 near-identical, v3 equally relevant but on the OTHER side
    // of the query. Pure top-3 by cosine = (0, 1, 2) — v2 edges v3 on
    // rel. MMR at lambda=0.5: after (0, 1), the v2 dup's penalty vs v1
    // (~1.0) sinks it below v3 (penalty = its own rel) -> (0, 1, 3).
    val corpus = Seq(
      (0L, vec(1.0, 0.0)),
      (1L, vec(0.99, 0.14)),
      (2L, vec(0.99, 0.139)),   // near-dup of 1, rel just above v3's
      (3L, vec(0.99, -0.14))
    ).toDF("vec_id", "embedding")
    val topk = corpus.crossJoin(
        corpus.filter($"vec_id" === 0).select($"embedding".as("q")))
      .select($"vec_id",
        graft.functions.VectorFunctions.cosine($"embedding", $"q").as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(topk.toSet == Set(0L, 1L, 2L), s"premise: top-3 keeps the dup: $topk")
    val got = Mmr.rerank(corpus, queryId = 0L, k = 3, lambda = 0.5, cand = 4)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 3L),
      s"expected diversity pick, got ${got.toSeq}")
  }

  test("MMR greedy is deterministic and ties break on smaller id") {
    val cands = Seq(
      (7L, 0.9, vec(1.0, 0.0)),
      (3L, 0.9, vec(1.0, 0.0)),  // identical vector + rel: tie -> id 3
      (9L, 0.5, vec(0.0, 1.0)))
    val r1 = Mmr.rerankLocal(cands, k = 3, lambda = 0.7)
    val r2 = Mmr.rerankLocal(cands, k = 3, lambda = 0.7)
    assert(r1 == r2)
    assert(r1.head._2 == 3L)
    // second pick: id 7 is a perfect dup of the selected id 3 (penalty
    // 1.0, score 0.7*0.9-0.3 = 0.33) vs diverse id 9 (penalty 0, score
    // 0.35) -> 9 wins
    assert(r1(1)._2 == 9L)
    assert(r1(2)._2 == 7L)
  }

  test("MMR first pick scores lambda*rel exactly (empty-set penalty 0)") {
    val r = Mmr.rerankLocal(Seq((1L, 0.8, vec(1.0, 0.0))), k = 1, lambda = 0.7)
    assert(r.head._3 == 0.7 * 0.8)
  }

  test("KL drift is 0 for a slice matching the corpus mix, > 0 otherwise") {
    // slices a and b share the same distribution {x: 2/3, y: 1/3} ->
    // both KL 0; slice c is all-z (disjoint support) -> KL = ln(N/n_c)
    // relative to its own support... compute directly:
    val toks = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x"), ("b", "y"),
      ("c", "z"), ("c", "z")
    ).toDF("source", "tok")
    val byName = Drift.klBySlice(toks, "source", "tok").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // a: P = (2/3, 1/3); Q = (x: 4/8, y: 2/8)
    val klA = 2.0 / 3 * math.log((2.0 / 3) / (4.0 / 8)) +
      1.0 / 3 * math.log((1.0 / 3) / (2.0 / 8))
    assert(math.abs(byName("a")._3 - BigDecimal(klA).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(byName("a") == byName("b"))
    // c: P = (z: 1); Q(z) = 2/8 -> KL = ln(4)
    assert(math.abs(byName("c")._3 - BigDecimal(math.log(4.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(byName("a")._1 == 3L && byName("a")._2 == 2L)
  }

  test("ANN-served MMR equals brute MMR when candidates cover the corpus") {
    // cand = corpus size: the forest's candidate set == the brute top-C
    // set, so the greedy must pick identically (the only approximation
    // in rerankAnn is candidate recall)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), concat(lit("w"), col("vec_id")).as("word"),
        col("embedding")).as[graft.api.VectorRecord]
    val model = graft.api.GraftVectors.buildIndex(emb, numTrees = 10,
      maxLeafSize = 10, seed = 7L)
    val n = emb.count().toInt
    val viaAnn = graft.api.GraftVectors
      .searchDiverse(model, emb, queryId = 0L, topK = 5, lambda = 0.7, cand = n)
      .collect().toSeq.sortBy(_.rank)
    val brute = graft.operators.Mmr.rerank(emb.toDF(), queryId = 0L, k = 5,
      lambda = 0.7, cand = n, idCol = "id")
      .collect().map(r => graft.api.MmrPick(r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_.rank)
    assert(viaAnn == brute)
    assert(viaAnn.head.id == 0L, "query's own vector is the most relevant pick")
  }

  test("batch ANN-served MMR equals the brute batch when candidates cover the corpus") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val model = graft.ann.AnnForest(numTrees = 10, maxLeafSize = 10, seed = 7L)
      .fit(e, "vec_id", "embedding")
    val n = e.count().toInt
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaAnn = Mmr.rerankBatchAnn(model, e, queries, k = 3,
        lambda = 0.7, cand = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val brute = Mmr.rerankBatch(e, queries, k = 3, lambda = 0.7, cand = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAnn === brute)
    assert(viaAnn.map(_._1) === Set(0L, 1L, 2L))
  }

  test("batch MMR equals the single-query greedy per qid") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Mmr.rerankBatch(e, queries, k = 3, lambda = 0.7, cand = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(batch.keySet == Set(0L, 1L, 2L))
    for (qid <- 0L to 2L) {
      val single = Mmr.rerank(e, qid, k = 3, lambda = 0.7, cand = 20)
        .collect().map(r => (qid, r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(batch(qid).toSeq.sortBy(_._2) == single.sortBy(_._2), s"qid=$qid")
    }
  }

  test("embedding drift: identical slice distributions -> cos_to_global = 1") {
    // two sources carrying the SAME vector multiset: each centroid
    // equals the global centroid, so both cosines round to exactly 1.0
    import org.apache.spark.sql.functions.posexplode
    val docs = Seq((0L, "a"), (1L, "a"), (2L, "b"), (3L, "b")).toDF("doc_id", "source")
    val e = Seq(
      (0L, vec(1.0, 2.0)), (1L, vec(3.0, 4.0)),
      (2L, vec(1.0, 2.0)), (3L, vec(3.0, 4.0))).toDF("vec_id", "embedding")
    val j = docs.join(e, col("doc_id") === col("vec_id"))
      .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "x")))
    val ps = j.groupBy(col("source"), col("dim"))
      .agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
    val g = j.groupBy(col("dim")).agg(avg(col("x")).as("gm"))
    val gg = g.agg(sum(col("gm") * col("gm")).as("gg"))
    val out = ps.join(g, "dim").groupBy(col("source"))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("m") * col("gm")).as("dot"), sum(col("m") * col("m")).as("nn"))
      .crossJoin(broadcast(gg))
      .select(col("source"),
        round(col("dot") / (sqrt(col("nn")) * sqrt(col("gg"))), 6).as("cos"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 1.0, "b" -> 1.0))
    // and the SHIPPED query (not this synthetic replica of its math):
    // one row per source present in the doc∩embedding id overlap, every
    // cosine a valid [-1, 1] value (near-random synthetic centroids can
    // legitimately point away from the global centroid)
    val shipped = SparkEntry.queries("q109_embedding_drift")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(shipped.nonEmpty && shipped.map(_._1).distinct.length == shipped.length)
    assert(shipped.forall { case (_, n, c) => n > 0 && c >= -1.0 && c <= 1.0 })
  }

  test("q107 plan: token-keyed hash aggs, no window, no sort before agg") {
    val p = SparkEntry.queries("q107_source_drift")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }
}
