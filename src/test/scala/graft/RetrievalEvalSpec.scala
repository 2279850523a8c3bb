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
