package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerKey
import graft.operators.KnnExact
import graft.sources.Tables

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("perKey returns exactly the k smallest rows per key (vs window oracle)") {
    val df = (0 until 5000).map(i => (i % 37L, (i * 2654435761L % 100003L).toDouble, i))
      .toDF("key", "score", "payload")
    val got = TopKPerKey.perKey(df, Seq("key"), Seq("score"), 5)
      .select("key", "score", "payload")
      .as[(Long, Double, Int)].collect().toSet
    val w = Window.partitionBy($"key").orderBy($"score")
    val want = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select("key", "score", "payload")
      .as[(Long, Double, Int)].collect().toSet
    assert(got === want)
  }

  test("handles k larger than group size and single-row keys") {
    val df = Seq((1L, 3.0), (1L, 1.0), (2L, 9.0)).toDF("key", "score")
    val got = TopKPerKey.perKey(df, Seq("key"), Seq("score"), 10)
      .as[(Long, Double)].collect().toSet
    assert(got === Set((1L, 3.0), (1L, 1.0), (2L, 9.0)))
  }

  test("physical plan is partial+final heaps with one exchange, no sort") {
    val df = Tables.embeddings(spark, sf0001)
      .select($"vec_id" % 7 as "key", $"vec_id".cast("double").as("score"))
    val out = TopKPerKey.perKey(df, Seq("key"), Seq("score"), 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    // two phases: partial (true) then final (false) around the exchange
    assert(plan.contains(", true") && plan.contains(", false"), plan)
    assert(!plan.toLowerCase.contains("sortexec"), "no full sort expected\n" + plan)
  }

  test("GraftExtensions injects the strategy (spark.sql.extensions contract)") {
    val strategies = org.apache.spark.sql.GraftBridge.injectedStrategies(
      new graft.plans.GraftExtensions, spark)
    assert(strategies.contains(graft.plans.TopKPerKeyStrategy), strategies.toString)
  }

  test("knn batch via TopKPerKey matches window-based knnBatch") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val viaWindow = KnnExact.knnBatch(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val candidates = emb.crossJoin(broadcast(queries))
      .select($"query_id", $"vec_id".as("neighbor_id"),
        graft.functions.VectorFunctions.sqEucDist($"embedding", $"qvec").as("dist"))
    val viaHeap = TopKPerKey.perKey(candidates, Seq("query_id"), Seq("dist", "neighbor_id"), 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaHeap === viaWindow)
  }
}
