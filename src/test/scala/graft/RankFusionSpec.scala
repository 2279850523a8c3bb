package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.RankFusion
import graft.sources.Tables

/** RankFusion: corpus-wide ranks from heap-pruned candidates +
  * count-ahead, asserted identical to the window formulation they
  * replace — including tie handling — plus the plan-shape claims
  * (no unpartitioned Window node anywhere in the fused queries).
  */
class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  test("countAheadRanks equals row_number over (score desc, id) incl. ties") {
    // deliberate ties: score = id % 5, several ids share each score
    val scores = (0L until 57L).map(i => (i, (i % 5).toDouble)).toDF("id", "sc")
    val expected = scores
      .withColumn("rk", row_number().over(Window.orderBy(col("sc").desc, col("id"))))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val cands = RankFusion.topCandidates(scores, "id", Seq("sc"), cand = 57)
    val got = RankFusion.countAheadRanks(scores, cands, "id", Seq("sc"), Seq("rk"))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(got == expected)
  }

  test("topCandidates is the exact top-cand prefix per score column") {
    val scores = (0L until 40L).map(i => (i, (i * 7 % 13).toDouble, (i * 5 % 11).toDouble))
      .toDF("id", "a", "b")
    val cands = RankFusion.topCandidates(scores, "id", Seq("a", "b"), cand = 6)
      .select("id").as[Long].collect().toSet
    def top(cn: String) = scores.orderBy(col(cn).desc, col("id")).limit(6)
      .select("id").as[Long].collect().toSet
    assert(cands == (top("a") ++ top("b")))
  }

  test("rrfTopK equals the corpus-wide-window RRF formulation") {
    // two lists over DIFFERENT id spaces (a: 0..99, b: 0..59 — b ⊂ a,
    // mirroring documents ⊃ embeddings), fused like q79
    val a = (0L until 100L).map(i => (i, ((i * 37) % 41).toDouble)).toDF("doc_id", "s")
    val b = (0L until 60L).map(i => (i, ((i * 23) % 29).toDouble)).toDF("doc_id", "cos")
    val ra = a.withColumn("rank_a",
      row_number().over(Window.orderBy(col("s").desc, col("doc_id"))))
    val rb = b.withColumn("rank_b",
      row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))))
    val viaWindow = ra.join(rb, "doc_id")
      .withColumn("rrf", round(
        lit(1.0) / (lit(60) + col("rank_a")) + lit(1.0) / (lit(60) + col("rank_b")), 6))
      .select(col("doc_id"), col("rank_a"), col("rank_b"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(5)
      .collect().toSeq
    val viaFusion = RankFusion.rrfTopK(
      a, "s", "rank_a", b, "cos", "rank_b",
      idCol = "doc_id", k = 5, kRrf = 60, cand = 100)
      .collect().toSeq
    assert(viaFusion == viaWindow)
  }

  test("rrfTopK rejects a candidate width below the exactness bound") {
    val a = Seq((1L, 1.0)).toDF("id", "s")
    intercept[IllegalArgumentException] {
      RankFusion.rrfTopK(a, "s", "ra", a, "s", "rb", idCol = "id", k = 20, cand = 50)
    }
  }

  test("rrfTopK rejects parameter combos whose rrf gap is inside the rounding quantum") {
    val a = Seq((1L, 1.0)).toDF("id", "s")
    // cand >= kRrf + 2k holds, but 1/(kRrf+k) - 2/(kRrf+cand+1) < 1e-6
    intercept[IllegalArgumentException] {
      RankFusion.rrfTopK(a, "s", "ra", a, "s", "rb",
        idCol = "id", k = 20, kRrf = 1000, cand = 1040)
    }
  }

  test("rrfTopK fails loudly when neither list's top-k survives the inner join") {
    // partially-disjoint id spaces: a = 0..99, b = 80..179 (overlap
    // 80..99). a's global top-5 are its HIGHEST scores, pinned to ids
    // 0..4; b's to 100..104 — none in the overlap, so no list's top-5
    // survives the join and the candidate bound's floor vanishes.
    val a = (0L until 100L).map(i => (i, if (i < 5) 1000.0 + i else (i * 37 % 41).toDouble))
      .toDF("doc_id", "s")
    val b = (80L until 180L).map(i => (i, if (i >= 100 && i < 105) 1000.0 + i else (i * 23 % 29).toDouble))
      .toDF("doc_id", "cos")
    val e = intercept[IllegalArgumentException] {
      RankFusion.rrfTopK(a, "s", "rank_a", b, "cos", "rank_b",
        idCol = "doc_id", k = 5, kRrf = 60, cand = 100).collect()
    }
    assert(e.getMessage.contains("too disjoint"))
    // same shapes with the top-5 of `a` moved INTO the overlap pass the
    // guard (the precondition is about survival, not containment)
    val a2 = (0L until 100L).map(i => (i, if (i >= 90) 1000.0 + i else (i * 37 % 41).toDouble))
      .toDF("doc_id", "s")
    assert(RankFusion.rrfTopK(a2, "s", "rank_a", b, "cos", "rank_b",
      idCol = "doc_id", k = 5, kRrf = 60, cand = 100).count() === 5L)
  }

  test("countAheadRanks: NULL-score rows are excluded from candidacy, not rank 1") {
    val scores = Seq(
      (1L, Some(9.0)), (2L, Some(5.0)), (3L, None), (4L, Some(7.0))
    ).toDF("id", "sc")
    val ranked = RankFusion.countAheadRanks(
      scores, scores, "id", Seq("sc"), Seq("rk"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // the window would rank 1->1, 4->2, 2->3 and put the NULL last;
    // count-ahead must agree on the non-null rows and emit nothing for id 3
    assert(ranked === Map(1L -> 1, 4L -> 2, 2L -> 3))
  }

  test("q79 fused plan has no Window node and heap-prunes via TakeOrdered") {
    val p = SparkEntry.queries("q79_hybrid_rrf")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "corpus-wide window crept back into q79:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q34 top-k heap-prunes before the 10-row rank window") {
    val df = SparkEntry.queries("q34_cosine_topk")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    // the surviving window ranks exactly the k rows the heap kept
    assert(df.count() == 10)
  }

  test("q79 fused result matches the window formulation on the fixture") {
    val docs = Tables.documents(spark, sf0001)
    val terms = docs.filter(col("doc_id") === 0)
      .select(explode(slice(graft.operators.TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
    val bm = graft.operators.Bm25.score(docs, terms)
    val sBm = docs.select(col("doc_id"))
      .join(bm.select(col("doc_id"), col("bm25")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("bm25"), lit(0.0)).as("s"))
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("__qvec"))
    val sCos = e.crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"), col("__qvec")).as("cos"))
    val viaWindow = sBm
      .withColumn("rank_bm25", row_number().over(Window.orderBy(col("s").desc, col("doc_id"))))
      .join(sCos.withColumn("rank_cos",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id")))), "doc_id")
      .withColumn("rrf", round(
        lit(1.0) / (lit(60) + col("rank_bm25")) + lit(1.0) / (lit(60) + col("rank_cos")), 6))
      .select(col("doc_id"), col("rank_bm25"), col("rank_cos"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      .collect().toSeq
    val viaFusion = SparkEntry.queries("q79_hybrid_rrf")(spark, sf0001).collect().toSeq
    assert(viaFusion == viaWindow)
  }

  test("linearTopK: hand-checked normalization, weight extremes, constant leg, plan shape") {
    import graft.operators.RankFusion
    val a = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0)).toDF("id", "sa")
    val b = Seq((1L, 2.0), (2L, 2.0), (3L, 1.0)).toDF("id", "sb")
    val got = RankFusion.linearTopK(a, "sa", b, "sb", "id", k = 3, weightA = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // norms: a → 0/0.5/1; b → 1/1/0; fused halves
    assert(got.toSeq === Seq((2L, 0.5, 1.0, 0.75), (1L, 0.0, 1.0, 0.5),
      (3L, 1.0, 0.0, 0.5)))
    // weightA = 1 ranks purely by leg a
    val onlyA = RankFusion.linearTopK(a, "sa", b, "sb", "id", k = 3, weightA = 1.0)
      .select($"id").as[Long].collect().toSeq
    assert(onlyA === Seq(3L, 2L, 1L))
    // a constant leg normalizes to 0 and cannot reorder
    val const = Seq((1L, 7.0), (2L, 7.0), (3L, 7.0)).toDF("id", "sb")
    val viaConst = RankFusion.linearTopK(a, "sa", const, "sb", "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(viaConst.forall(_._2 === 0.0))
    intercept[IllegalArgumentException] {
      RankFusion.linearTopK(a, "sa", b, "sb", "id", k = 1, weightA = 1.5)
    }
    // q164 plan: no window, heap top-k
    val p = SparkEntry.queries("q164_hybrid_linear")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
