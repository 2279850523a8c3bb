package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalEval

/** Metric semantics on hand-checkable rankings: recall/MRR/nDCG per
  * query, misses, perfect rankings, and unjudged-result handling. */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)
  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("recall/MRR/nDCG: partial hit, total miss, perfect ranking") {
    val results = Seq(
      // q1: relevant docs at ranks 2 and 5; a relevant doc (99) missed
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5),
      // q2: nothing relevant retrieved
      (2L, 20L, 1), (2L, 21L, 2),
      // q3: ideal order retrieved exactly
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3)
    ).toDF("qid", "doc_id", "rank")
    val truth = Seq(
      (1L, 11L, 2.0), (1L, 14L, 1.0), (1L, 99L, 3.0),
      (2L, 77L, 1.0),
      (3L, 30L, 3.0), (3L, 31L, 2.0), (3L, 32L, 1.0)
    ).toDF("qid", "doc_id", "grade")
    val got = RetrievalEval.metrics(results, truth, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // q1: recall 2/3; mrr 1/2; dcg = 2/log2(3) + 1/log2(6),
    //     idcg = 3/log2(2) + 2/log2(3) + 1/log2(4)
    val dcg1 = 2.0 / log2(3) + 1.0 / log2(6)
    val idcg1 = 3.0 / log2(2) + 2.0 / log2(3) + 1.0 / log2(4)
    assert(got(1L) === ((r4(2.0 / 3.0), 0.5, r4(dcg1 / idcg1))))
    assert(got(2L) === ((0.0, 0.0, 0.0)))
    assert(got(3L) === ((1.0, 1.0, 1.0)))
  }

  test("harness measures the ANN forest against the exact oracle (recall/nDCG floors)") {
    import graft.sources.Tables
    import graft.operators.KnnExact
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 30)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val model = graft.ann.AnnForest(numTrees = 50, maxLeafSize = 5, seed = 42L)
      .fit(emb, "vec_id", "embedding")
    val results = model.knnJoinBucketed(emb, queries, topK = 10)
      .select($"query_id".as("qid"), $"neighbor_id".as("doc_id"), $"rank")
    // graded qrels from the exact ranking: grade = 11 - exact rank
    val truth = KnnExact.knnBatch(emb, queries, 10)
      .select($"query_id".as("qid"), $"neighbor_id".as("doc_id"),
        (lit(11) - $"rank").cast("double").as("grade"))
    val m = RetrievalEval.metrics(results, truth, k = 10)
      .agg(avg($"recall"), avg($"mrr"), avg($"ndcg"))
      .head()
    val (recall, mrr, ndcg) = (m.getDouble(0), m.getDouble(1), m.getDouble(2))
    info(f"forest via harness: recall@10=$recall%.3f mrr=$mrr%.3f ndcg=$ndcg%.3f")
    // the same statistical-oracle floors the hand-rolled checks use,
    // now measured through the shared harness; mrr=1 because rank-1 is
    // the query's own vector (exact top-1, grade 10)
    assert(recall >= 0.8 && mrr === 1.0 && ndcg >= 0.85)
  }

  test("k truncates results; grades beyond k shrink the ideal but recall counts all relevant") {
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("qid", "doc_id", "rank")
    val truth = Seq((1L, 12L, 1.0), (1L, 55L, 1.0)).toDF("qid", "doc_id", "grade")
    // k=2 drops the rank-3 hit entirely: no relevant in the top-2
    val at2 = RetrievalEval.metrics(results, truth, k = 2).head()
    assert(at2.getDouble(1) === 0.0 && at2.getDouble(2) === 0.0 && at2.getDouble(3) === 0.0)
    // k=3 sees it: recall 1/2, mrr 1/3, ndcg = (1/log2(4)) / ideal(1/log2(2)+1/log2(3))
    val at3 = RetrievalEval.metrics(results, truth, k = 3).head()
    assert(at3.getDouble(1) === 0.5)
    assert(at3.getDouble(2) === r4(1.0 / 3.0))
    assert(at3.getDouble(3) ===
      r4((1.0 / log2(4)) / (1.0 / log2(2) + 1.0 / log2(3))))
  }
}
