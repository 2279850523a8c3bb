package graft

import org.apache.spark.sql.functions._
import graft.ann._
import graft.operators.KnnExact
import graft.sources.Tables

class NswGraphSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001).cache()
  lazy val model = NswGraph(m = 12, efConstruction = 64, numShards = 4, seed = 42L)
    .fit(emb, "vec_id", "embedding")

  test("build is deterministic: two fits produce identical adjacency") {
    val m2 = NswGraph(m = 12, efConstruction = 64, numShards = 4, seed = 42L)
      .fit(emb, "vec_id", "embedding")
    val g1 = model.graph.select("shard", "node_id", "nbrs")
      .as[(Int, Long, Seq[Long])].collect().toSet
    val g2 = m2.graph.select("shard", "node_id", "nbrs")
      .as[(Int, Long, Seq[Long])].collect().toSet
    assert(g1 === g2)
  }

  test("every corpus row lands in exactly one shard; degree bounded by m") {
    val n = emb.count()
    assert(model.graph.count() === n)
    assert(model.graph.select(count_distinct(col("node_id"))).head().getLong(0) === n)
    val maxDeg = model.describe().agg(max(col("max_degree"))).head().getInt(0)
    assert(maxDeg <= 12)
    // no orphan nodes beyond the per-shard entry in a trivial shard:
    // every node of a >1-node shard has at least one edge
    val orphans = model.graph.filter(size(col("nbrs")) === 0)
      .join(model.graph.groupBy("shard").agg(count(lit(1)).as("sn"))
        .filter(col("sn") > 1), Seq("shard"))
      .count()
    assert(orphans === 0L)
  }

  test("adjacency is symmetric or prune-reduced: every edge endpoint exists in the shard") {
    val nodes = model.graph.select(col("shard"), col("node_id"))
      .as[(Int, Long)].collect().toSet
    val edges = model.graph.select(col("shard"), col("node_id"), explode(col("nbrs")).as("nb"))
      .as[(Int, Long, Long)].collect()
    edges.foreach { case (s, _, nb) => assert(nodes.contains((s, nb))) }
  }

  test("knnJoin: rank-1 self match and recall floor vs exact oracle") {
    val queries = emb.filter($"vec_id" % 7 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = model.knnJoin(queries, topK = 10, ef = 80).cache()
    val r1 = got.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    r1.foreach { case (q, n) => assert(q === n, s"rank-1 self miss for $q") }
    val exact = KnnExact.knnBatch(emb, queries, 10)
      .groupBy("query_id").agg(collect_set("neighbor_id").as("truth"))
      .as[(Long, Seq[Long])].collect().toMap
    val approx = got.groupBy("query_id").agg(collect_set("neighbor_id").as("got"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(approx.keySet === exact.keySet)
    val recalls = exact.map { case (q, t) =>
      approx(q).toSet.intersect(t.toSet).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"nsw mean recall@10 (4 shards, m=12, ef=80) = $mean%.3f")
    assert(mean >= 0.9)
  }

  test("knnJoin distances are exact squared euclid on returned pairs") {
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = model.knnJoin(queries, topK = 3, ef = 32)
    val checked = got
      .join(emb.select($"vec_id".as("query_id"), $"embedding".as("qv")), "query_id")
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("nv")), "neighbor_id")
      .select(($"dist" - graft.functions.VectorFunctions.sqEucDist($"qv", $"nv")).as("err"))
      .agg(max(abs($"err"))).head().getDouble(0)
    assert(checked < 1e-9)
  }

  test("save/load roundtrip serves identically") {
    val dir = java.nio.file.Files.createTempDirectory("nsw").toString
    model.save(dir)
    val loaded = NswGraph.load(dir, spark)
    assert(loaded.m === 12 && loaded.numShards === 4 && loaded.metric === "euclidean")
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val a = model.knnJoin(queries, topK = 5, ef = 40)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val b = loaded.knnJoin(queries, topK = 5, ef = 40)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(a === b)
  }

  test("knnJoinFiltered: results only from the allowed set, recall floor vs filtered exact") {
    val allowed = emb.filter($"label" % 2 === 0).select($"vec_id")
    val queries = emb.filter($"vec_id" % 11 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = model.knnJoinFiltered(queries, allowed, topK = 5, ef = 80).cache()
    // no inadmissible neighbor ever surfaces
    assert(got.join(allowed.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_anti").count() === 0L)
    val filteredCorpus = emb.join(allowed, Seq("vec_id")).cache()
    val exact = KnnExact.knnBatch(filteredCorpus, queries, 5)
      .groupBy("query_id").agg(collect_set("neighbor_id").as("truth"))
      .as[(Long, Seq[Long])].collect().toMap
    val approx = got.groupBy("query_id").agg(collect_set("neighbor_id").as("got"))
      .as[(Long, Seq[Long])].collect().toMap
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Seq.empty).toSet.intersect(t.toSet).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"nsw filtered mean recall@5 = $mean%.3f")
    assert(mean >= 0.9)
  }

  test("radiusJoin: every returned pair is in radius; dense-exactness at generous ef") {
    val queries = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    // pick a radius around the exact 5th-NN distance of the corpus
    val exact5 = KnnExact.knnBatch(emb, queries, 5)
    val r = exact5.filter($"rank" === 5).agg(avg($"dist")).head().getDouble(0)
    val got = model.radiusJoin(queries, maxDist = r, ef = 200).cache()
    assert(got.filter($"dist" > r).count() === 0L)
    // with ef far above the in-radius density, the beam finds every
    // in-radius point the exact scan finds
    val truth = graft.operators.KnnExact.knnBatch(emb, queries, 50)
      .filter($"dist" <= r)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val gotSet = got.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val rec = (gotSet & truth).size.toDouble / truth.size
    info(f"nsw radius recall = $rec%.3f (${truth.size} truth pairs)")
    assert(rec >= 0.95)
  }

  test("append rebuilds only touched shards and is BIT-IDENTICAL to a fresh fit of the union") {
    val old = emb.filter($"vec_id" < 400)
    val delta = emb.filter($"vec_id" >= 400 && $"vec_id" < 420)
    val appended = NswGraph(m = 12, efConstruction = 64, numShards = 4, seed = 42L)
      .fit(old, "vec_id", "embedding").append(delta)
    val fresh = NswGraph(m = 12, efConstruction = 64, numShards = 4, seed = 42L)
      .fit(emb.filter($"vec_id" < 420), "vec_id", "embedding")
    val ga = appended.graph.select("shard", "node_id", "nbrs")
      .as[(Int, Long, Seq[Long])].collect().toSet
    val gf = fresh.graph.select("shard", "node_id", "nbrs")
      .as[(Int, Long, Seq[Long])].collect().toSet
    assert(ga === gf)
  }

  test("remove tombstones: id never surfaces but still routes; compact purges fit-identically") {
    val queries = emb.filter($"vec_id" < 30)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val removedIds = emb.filter($"vec_id" % 7 === 3).select($"vec_id")
    val after = model.remove(removedIds)
    val got = after.knnJoin(queries, topK = 10, ef = 80).cache()
    assert(got.join(removedIds.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_anti").count() === got.count())
    // tombstones visible in describe, graph row count unchanged (routing intact)
    assert(after.graph.count() === model.graph.count())
    assert(after.describe().agg(sum($"tombstones")).head().getLong(0) ===
      removedIds.count())
    // serve over tombstones == exact kNN over the live set (generous ef)
    val exact = graft.operators.KnnExact.knnBatch(
        emb.join(removedIds, Seq("vec_id"), "left_anti"), queries, 10)
      .groupBy("query_id").agg(collect_set("neighbor_id").as("t"))
      .as[(Long, Seq[Long])].collect().toMap
    val approx = got.groupBy("query_id").agg(collect_set("neighbor_id").as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    val rec = exact.map { case (q, t) =>
      approx(q).toSet.intersect(t.toSet).size.toDouble / t.size }
    assert(rec.sum / rec.size >= 0.9)
    // ratio-gated compact: every shard holds ~1/7 tombstones > 0.05
    // threshold → all rebuild; result is fit-identical to the live set
    val compacted = after.compact(maxDeadRatio = 0.05)
    assert(compacted.graph.count() === model.graph.count() - removedIds.count())
    val fresh = NswGraph(m = 12, efConstruction = 64, numShards = 4, seed = 42L)
      .fit(emb.join(removedIds, Seq("vec_id"), "left_anti"), "vec_id", "embedding")
    val gc = compacted.graph.select("shard", "node_id", "nbrs")
      .as[(Int, Long, Seq[Long])].collect().toSet
    val gf = fresh.graph.select("shard", "node_id", "nbrs")
      .as[(Int, Long, Seq[Long])].collect().toSet
    assert(gc === gf)
    // a no-op compact (threshold above the backlog) returns this model
    assert(after.compact(maxDeadRatio = 0.99).graph eq after.graph)
  }

  test("cosine metric: normalized-space ordering matches exact cosine top-1") {
    val cos = NswGraph(m = 12, efConstruction = 64, numShards = 2,
      metric = "cosine", seed = 42L).fit(emb, "vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = cos.knnJoin(queries, topK = 1, ef = 80)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    got.foreach { case (q, n) => assert(q === n, s"cosine rank-1 self miss for $q") }
  }

  test("beam drain-fallback: an orphaned outlier still serves exactly at ef >= shard size") {
    // a tight cluster plus one extreme outlier: the outlier is every
    // cluster node's worst neighbor, so over-degree prunes strip its
    // reverse edges and no walk from the entry reaches it — the
    // flat-NSW orphan artifact. The round-10 drain-fallback scans the
    // unvisited remainder when the frontier exhausts with capacity
    // left, so ef >= shard size is EXACT by construction, not
    // exact-over-the-reachable-component.
    val rows = (0L until 40L).map(i => (i, Seq(i.toFloat / 100f, 0f)))
      .toDF("vec_id", "embedding")
      .unionByName(Seq((99L, Seq(1000f, 1000f))).toDF("vec_id", "embedding"))
    val m1 = NswGraph(m = 4, efConstruction = 8, numShards = 1, seed = 1L).fit(rows)
    val q = Seq((0L, Seq(999f, 999f))).toDF("query_id", "qvec")
    val got = m1.knnJoin(q, topK = 1, ef = 100)
      .select("neighbor_id").as[Long].head()
    assert(got === 99L, "orphaned outlier missed even at exhaustive ef")
  }

  test("HNSW hierarchy: deterministic levels, exhaustive-ef equality with flat, lifecycle invariant") {
    // levels are a pure function of (id, seed, m) — the property that
    // carries the bit-identical rebuild invariants to hierarchy mode
    for (id <- Seq(0L, 1L, 17L, 123456789L))
      assert(NswGraph.levelOf(id, 42L, 12) === NswGraph.levelOf(id, 42L, 12))
    // levels follow the exponential shape: over many ids, level >= 1
    // frequency ~ 1/m
    val frac = (0L until 10000L).count(NswGraph.levelOf(_, 42L, 12) >= 1) / 10000.0
    assert(frac > 0.03 && frac < 0.20, s"level>=1 fraction $frac off 1/12")
    val hg = NswGraph(m = 12, efConstruction = 64, numShards = 4,
      seed = 42L, hierarchy = true)
    val queries = emb.filter($"vec_id" % 17 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    def served(mm: NswModel, ef: Int) =
      mm.knnJoin(queries, topK = 5, ef = ef)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    val hier = hg.fit(emb)
    // at ef >= shard size both modes are EXACT (drain-fallback), so
    // the hierarchy cannot change results there
    val flat = NswGraph(m = 12, efConstruction = 64, numShards = 4,
      seed = 42L).fit(emb)
    assert(served(hier, 500) === served(flat, 500),
      "hierarchical and flat diverge at exhaustive ef")
    // fixture-scale recall at constrained ef stays high
    val got = served(hier, 40).map { case (q, _, n) => (q, n) }
    val truth = graft.operators.KnnExact.knnBatch(emb, queries, 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"hierarchical recall $recall below floor")
    // lifecycle: append rebuild of touched shards is bit-identical to
    // a fresh hierarchical fit of the union (levels reproduce from ids)
    val a = hg.fit(emb.filter($"vec_id" % 4 =!= 0))
      .append(emb.filter($"vec_id" % 4 === 0))
    val b = hg.fit(emb)
    assert(a.graph.exceptAll(b.graph).isEmpty &&
      b.graph.exceptAll(a.graph).isEmpty,
      "hierarchical append diverged from fresh fit")
    // filtered serve under the hierarchy: results only from the
    // allowed set, and exact at exhaustive ef (descent entry + the
    // admission-gated beam + drain-fallback compose)
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id")
    val fGot = hier.knnJoinFiltered(queries, allowed, topK = 3, ef = 500)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val allowedSet = allowed.as[Long].collect().toSet
    fGot.foreach { case (_, n) => assert(allowedSet.contains(n)) }
    val fTruth = graft.operators.KnnExact.knnBatch(
        emb.join(allowed, Seq("vec_id")), queries, 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(fGot.toSet === fTruth,
      "hierarchical filtered serve not exact at exhaustive ef")
  }
}
