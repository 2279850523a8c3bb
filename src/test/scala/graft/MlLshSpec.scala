package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnExact, MlLsh}
import graft.sources.Tables

class MlLshSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("lloyd: deterministic, k>n clamps, centroids finite") {
    val pts = Array.tabulate(10)(i => Array(i.toFloat, (i * 2).toFloat))
    val a = graft.ann.IvfIndex.lloyd(pts, k = 4, iters = 8, seed = 7L)
    val b = graft.ann.IvfIndex.lloyd(pts, k = 4, iters = 8, seed = 7L)
    assert(a.length === 4)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    a.foreach(_.foreach(v => assert(!v.isNaN && !v.isInfinite)))
    // k > n: one centroid per point, no crash
    val c = graft.ann.IvfIndex.lloyd(pts.take(3), k = 16, iters = 4, seed = 7L)
    assert(c.length === 3)
  }

  test("BRP-LSH knn join: rank-1 self match and reasonable recall with wide radius") {
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = MlLsh.approxKnnJoin(emb, queries, k = 5, maxDist = 1e9)
    val r1 = got.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(r1.nonEmpty)
    r1.foreach { case (q, n) => assert(q === n, s"rank-1 of $q should be itself") }

    val exact = KnnExact.knnBatch(emb, queries, 5)
      .groupBy("query_id").agg(collect_set("neighbor_id").as("truth"))
      .as[(Long, Seq[Long])].collect().toMap
    val approx = got.groupBy("query_id").agg(collect_set("neighbor_id").as("got"))
      .as[(Long, Seq[Long])].collect().toMap
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Seq.empty).toSet.intersect(t.toSet).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"BRP-LSH mean recall@5 = $mean%.3f")
    assert(mean >= 0.5) // stateless projections; forest is the quality path
  }

  test("approx distance join returns only pairs within the radius") {
    val pairs = MlLsh.approxDistanceJoin(emb, emb, maxDist = 3.0)
    pairs.collect().foreach { r => assert(r.getDouble(2) <= 3.0) }
  }

  test("IVF knn join: rank-1 self match and recall floor") {
    val model = graft.ann.IvfIndex(nlist = 16, nprobe = 4).fit(emb)
    val queries = emb.filter($"vec_id" < 30)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = model.knnJoin(emb, queries, topK = 10)
    val r1 = got.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(r1.length === 30)
    r1.foreach { case (q, n) => assert(q === n) }
    val exact = KnnExact.knnBatch(emb, queries, 10)
      .groupBy("query_id").agg(collect_set("neighbor_id").as("truth"))
      .as[(Long, Seq[Long])].collect().toMap
    val approx = got.groupBy("query_id").agg(collect_set("neighbor_id").as("got"))
      .as[(Long, Seq[Long])].collect().toMap
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Seq.empty).toSet.intersect(t.toSet).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@10 (nlist=16, nprobe=4) = $mean%.3f")
    assert(mean >= 0.6)
  }

  test("IVF save/load roundtrip preserves the k-NN join result") {
    val model = graft.ann.IvfIndex(nlist = 16, nprobe = 4).fit(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    model.save(dir, spark)
    val loaded = graft.ann.IvfModel.load(dir, spark)
    assert(loaded.nprobe === model.nprobe)
    assert(loaded.centroids.length === model.centroids.length)
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val a = model.knnJoin(emb, queries, topK = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val b = loaded.knnJoin(emb, queries, topK = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(a === b)
  }
}
