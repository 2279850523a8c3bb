package graft

import org.apache.spark.sql.functions._
import graft.operators.MaxSim
import graft.sources.Tables

/** Late-interaction (MaxSim) retrieval: exact semantics, the refined
  * serving path's exactness at fixture scale, and plan shape. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  // Doc groups of 5 token vectors; query = group 0's bag.
  lazy val mv = Tables.embeddings(spark, sf0001)
    .select(floor($"vec_id" / 5).cast("long").as("gid"),
      $"vec_id".as("qt"), $"embedding".as("vec"))
    .cache()
  lazy val corpus = mv.select($"gid", $"vec")
  lazy val queries = mv.filter($"gid" === 0)
    .select(lit(0L).as("qid"), $"qt", $"vec".as("qvec"))

  test("self-query scores |q| and ranks first") {
    val top = MaxSim.topK(corpus, queries, k = 3).orderBy($"rank").collect()
    // every query token's best match is itself (cos = 1), so group 0's
    // MaxSim is exactly the query token count
    assert(top.head.getAs[Long]("gid") === 0L)
    assert(top.head.getAs[Double]("maxsim") === 5.0)
    assert(top.head.getAs[Int]("rank") === 1)
  }

  test("hand-computed two-group corpus") {
    // group 1 = {e1}, group 2 = {e2}; query = {e1, e2}.
    // MaxSim(q, g1) = cos(e1,e1) + max over g1 for e2 = 1 + cos(e2,e1)
    val c = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("gid", "vec")
    val q = Seq(
      (0L, 10L, Array(1f, 0f)), (0L, 11L, Array(0f, 1f)))
      .toDF("qid", "qt", "qvec")
    val sc = MaxSim.scores(c, q).collect()
      .map(r => r.getAs[Long]("gid") -> r.getAs[Double]("maxsim")).toMap
    // each group matches one token perfectly and the other at cos 0
    assert(sc(1L) === 1.0)
    assert(sc(2L) === 1.0)
  }

  test("refined serving path recovers the exact top-10 at fixture scale") {
    val exact = MaxSim.topK(corpus, queries, k = 10)
      .select($"gid", $"rank", $"maxsim").orderBy($"rank").collect()
    val refined = MaxSim.topKRefined(corpus, queries, k = 10, candPerTok = 64)
      .select($"gid", $"rank", $"maxsim").orderBy($"rank").collect()
    assert(refined.map(_.toSeq).toSeq === exact.map(_.toSeq).toSeq)
  }

  test("ANN stage-1 (seeded token forest) recovers the exact top-10 set") {
    val tokens = mv.select($"qt".as("vec_id"), $"vec".as("embedding"))
    val forest = graft.ann.AnnForest(numTrees = 50, maxLeafSize = 5, seed = 42L)
      .fit(tokens, "vec_id", "embedding")
    val annCands = forest.knnJoinBucketed(tokens,
        queries.select($"qt".as("query_id"), $"qvec"), topK = 64)
      .select($"query_id".as("qt"), $"neighbor_id")
    val cands = annCands
      .join(mv.select($"qt".as("neighbor_id"), $"gid"), Seq("neighbor_id"))
      .join(queries.select($"qid", $"qt"), Seq("qt"))
      .select($"qid", $"gid").distinct()
    val got = MaxSim.topKOnCandidates(corpus, queries, 10, cands)
      .select($"gid").as[Long].collect().toSet
    val exact = MaxSim.topK(corpus, queries, 10)
      .select($"gid").as[Long].collect().toSet
    assert(got === exact, "indexed serving must recover the exact top-10 set here")
  }

  test("plan: query side broadcast, candidate heap bounded (no corpus-wide window sort)") {
    val plan = MaxSim.topKRefined(corpus, queries, k = 10, candPerTok = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query bag should broadcast:\n$plan")
    assert(plan.contains("TopKPerKey"), s"heap prune missing:\n$plan")
  }
}
