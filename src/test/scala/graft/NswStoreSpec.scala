package graft

import org.apache.spark.sql.functions._
import graft.ann._
import graft.sources.Tables

/** The standing-table face of the NSW graph: serve-from-table parity,
  * the single-pass upsert's bit-identical-to-fresh-fit invariant, and
  * multi-entry beam seeding (round-10 verdict items #1/#3/#4). */
class NswStoreSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private val nsw = NswGraph(m = 12, efConstruction = 64, numShards = 4, seed = 42L)

  private def queries = emb.filter($"vec_id" % 5 === 0)
    .select($"vec_id".as("query_id"), $"embedding".as("qvec"))

  private def servedSet(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet

  test("knnJoinStore serves identically to the model over the same rows") {
    val model = nsw.fit(emb)
    NswStore.saveStore(model, "graft_nswstore_t1")
    val a = servedSet(model.knnJoin(queries, topK = 5, ef = 40))
    val b = servedSet(NswStore.knnJoinStore(spark, "graft_nswstore_t1",
      queries, topK = 5, ef = 40))
    assert(a === b)
    // and through a pathologically small maxPartitionBytes — the split
    // that would shear a shard across input partitions without the
    // restore-the-routing repartition (the round-9 advisory)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val c = servedSet(NswStore.knnJoinStore(spark, "graft_nswstore_t1",
        queries, topK = 5, ef = 40))
      assert(a === c)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("upsertStore history leaves the table BIT-IDENTICAL to a fresh fit of the live set") {
    // bootstrap on a prefix, add the next slice, then one batch that
    // carries departures (pure takedowns + a changed id appearing in
    // BOTH legs with a new vector) — the exact VecFold shapes
    val wave1 = emb.filter($"vec_id" % 3 =!= 0)
    NswStore.saveStore(nsw.fit(wave1), "graft_nswstore_t2")
    NswStore.upsertStore(spark, "graft_nswstore_t2",
      spark.range(0).select($"id".as("vec_id")),
      emb.filter($"vec_id" % 3 === 0).select($"vec_id", $"embedding"))
    val changed = emb.filter($"vec_id" % 9 === 1)
      .select($"vec_id",
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val takedown = emb.filter($"vec_id" % 9 === 2).select($"vec_id")
    NswStore.upsertStore(spark, "graft_nswstore_t2",
      changed.select($"vec_id").unionByName(takedown),
      changed)
    val live = emb.join(takedown, Seq("vec_id"), "left_anti")
      .join(changed.select($"vec_id"), Seq("vec_id"), "left_anti")
      .select($"vec_id", $"embedding")
      .unionByName(changed)
    NswStore.saveStore(nsw.fit(live), "graft_nswstore_t2f")
    val a = spark.table("graft_nswstore_t2")
    val b = spark.table("graft_nswstore_t2f")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "maintained store diverged from a fresh fit of the live set")
    // tombstones never persist (the purge rides the same rebuild pass)
    assert(a.filter($"del").isEmpty)
    // and serving reflects the upserted vectors: the changed ids serve
    // from their NEW geometry (self-match at rank 1 on the new vector).
    // Two fixture-engineered exclusions: NaN-bearing vectors (a NaN
    // self-distance sorts last by the total-order policy) and changed
    // ids whose doubled vector bit-collided with another embedding —
    // the fixture plants exact/colinear duplicates, and first-seen
    // dedup keeps only one of a colliding pair in ANY fit, so only
    // ids actually present in the store can assert the self match
    val q2 = changed
      .filter(!exists($"embedding", x => isnan(x)))
      .join(a.select($"node_id".as("vec_id")), Seq("vec_id"), "left_semi")
      .limit(3)
      .select($"vec_id".as("query_id"),
        $"embedding".as("qvec"))
    val top1 = NswStore.knnJoinStore(spark, "graft_nswstore_t2", q2,
      topK = 1, ef = 200)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    top1.foreach { case (q, n) => assert(q === n) }
  }

  test("upsert with no departures and a 1-shard delta is O(touched): other shards byte-untouched") {
    NswStore.saveStore(nsw.fit(emb.filter($"vec_id" >= 10)), "graft_nswstore_t3")
    val before = spark.table("graft_nswstore_t3").localCheckpoint()
    // one new row routes to exactly one shard
    NswStore.upsertStore(spark, "graft_nswstore_t3",
      spark.range(0).select($"id".as("vec_id")),
      emb.filter($"vec_id" === 0).select($"vec_id", $"embedding"))
    val delta = emb.filter($"vec_id" === 0)
    val homeShard = delta
      .select(pmod(xxhash64(lit(42L), $"vec_id"), lit(4)).cast("int"))
      .head().getInt(0)
    val after = spark.table("graft_nswstore_t3")
    val beforeOther = before.filter($"shard" =!= homeShard)
    val afterOther = after.filter($"shard" =!= homeShard)
    assert(beforeOther.exceptAll(afterOther).isEmpty &&
      afterOther.exceptAll(beforeOther).isEmpty,
      "an untouched shard changed under a 1-shard delta")
    assert(after.count() === before.count() + 1)
  }

  test("HIERARCHICAL standing store: upsert keeps the bit-identical invariant; serve matches model") {
    // the hierarchy flag rides the params table, so the store's
    // touched-shard rebuilds re-run the HNSW build (levels reproduce
    // from ids) — the exact-equality discipline is mode-independent
    val hg = NswGraph(m = 12, efConstruction = 64, numShards = 4,
      seed = 42L, hierarchy = true)
    NswStore.saveStore(hg.fit(emb.filter($"vec_id" % 2 === 0)), "graft_nswstore_t4")
    NswStore.upsertStore(spark, "graft_nswstore_t4",
      emb.filter($"vec_id" % 8 === 0).select($"vec_id"),
      emb.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding"))
    val live = emb.filter($"vec_id" % 2 === 1 ||
      ($"vec_id" % 2 === 0 && $"vec_id" % 8 =!= 0))
    NswStore.saveStore(hg.fit(live), "graft_nswstore_t4f")
    val a = spark.table("graft_nswstore_t4")
    val b = spark.table("graft_nswstore_t4f")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "hierarchical maintained store diverged from fresh fit")
    // params roundtrip the flag, and the store serve runs the
    // hierarchy (equal to the fresh model's serve)
    assert(NswStore.loadStore(spark, "graft_nswstore_t4").hierarchy)
    val sv = servedSet(NswStore.knnJoinStore(spark, "graft_nswstore_t4",
      queries, topK = 5, ef = 40))
    val mv = servedSet(hg.fit(live).knnJoin(queries, topK = 5, ef = 40))
    assert(sv === mv)
  }

  test("multi-entry seeding: exhaustive-beam equality, and entries spread deterministically") {
    val model = nsw.fit(emb)
    // ef past any shard size makes both walks exhaustive — equal by
    // construction, so multi-entry cannot change served results there
    val a = servedSet(model.knnJoin(queries, topK = 5, ef = 500))
    val b = servedSet(model.knnJoin(queries, topK = 5, ef = 500, numEntries = 4))
    assert(a === b)
    // at a CONSTRAINED beam the multi-entry serve is still a valid
    // top-k (full rank sets, distances ascending per query)
    val c = model.knnJoin(queries, topK = 5, ef = 12, numEntries = 4)
      .groupBy($"query_id")
      .agg(count(lit(1)).as("n"),
        min($"rank").as("lo"), max($"rank").as("hi"))
      .as[(Long, Long, Int, Int)].collect()
    c.foreach { case (_, n, lo, hi) => assert(n === 5L && lo === 1 && hi === 5) }
    assert(NswGraph.spreadEntries(100, 4) === Seq(0, 25, 50, 75))
    assert(NswGraph.spreadEntries(3, 8) === Seq(0, 1, 2))
    assert(NswGraph.spreadEntries(10, 1) === Seq(0))
  }
}
