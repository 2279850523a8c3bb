package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupClusters

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, triangle, and singleton-free isolation") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val comps = DedupClusters.components(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) === 1L))
    assert(Seq(10L, 11L, 12L).forall(comps(_) === 10L))
    assert(Seq(20L, 21L).forall(comps(_) === 20L))
    assert(comps.size === 9) // only nodes that appear in edges
  }

  test("components handles a long chain within maxIter (label hops)") {
    val n = 30
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val comps = DedupClusters.components(edges).as[(Long, Long)].collect()
    assert(comps.forall(_._2 === 0L))
  }

  test("survivors drops every non-canonical cluster member") {
    val docs = (0L until 10L).map(i => (i, s"d$i")).toDF("doc_id", "body")
    val edges = Seq((1L, 5L), (5L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    val comps = DedupClusters.components(edges)
    val kept = DedupClusters.survivors(docs, "doc_id", comps)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L, 2L, 4L, 6L, 8L, 9L)) // dropped: 5,7 (→1), 3 (→2)
  }

  test("keepBest keeps the highest-quality member; ties break to the smallest id") {
    // cluster {1,5,7}: 5 has top quality → keep 5 (NOT min-id 1)
    // cluster {2,3}: tied quality → keep 2 (smallest id)
    // 0,4,6 unclustered → all survive
    val docs = Seq(
      (0L, 10.0), (1L, 3.0), (2L, 5.0), (3L, 5.0),
      (4L, 1.0), (5L, 9.0), (6L, 2.0), (7L, 4.0))
      .toDF("doc_id", "quality")
    val edges = Seq((1L, 5L), (5L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = DedupClusters.keepBest(docs, "doc_id", "quality",
        DedupClusters.components(edges))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 2L, 4L, 5L, 6L))
  }

  test("leakage-safe split: clusters never straddle splits; singletons covered") {
    val docs = (0L until 200L).map(i => (i, s"d$i")).toDF("doc_id", "body")
    // chain {1,5,7}, pair {2,3}, rest singletons
    val edges = Seq((1L, 5L), (5L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    val out = DedupClusters.leakageSafeSplit(docs, "doc_id",
        DedupClusters.components(edges), trainPct = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 200, "every doc gets an assignment")
    // cluster atomicity: one split per cluster label
    val splitsPerCluster = out.groupBy(_._2).values.map(_.map(_._3).toSet)
    assert(splitsPerCluster.forall(_.size == 1), "a cluster straddles splits")
    assert(out.filter(r => Set(1L, 5L, 7L).contains(r._1)).map(_._3).toSet.size == 1)
    // the hash split is near the requested ratio on ~200 clusters
    val trainFrac = out.count(_._3 == "train").toDouble / out.length
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"trainFrac=$trainFrac")
    // deterministic: same input -> same assignment
    val out2 = DedupClusters.leakageSafeSplit(docs, "doc_id",
        DedupClusters.components(edges), trainPct = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }
}
