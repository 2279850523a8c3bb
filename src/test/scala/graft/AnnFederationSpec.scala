package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ann.{AnnFederation, IvfIndex}
import graft.operators.KnnExact
import graft.sources.Tables

/** Federated vector-search serve across independently-fit IVF shards.
  * Certifying invariants: exact-regime federation (nprobe = nlist per
  * shard) equals the brute-force top-k of the union corpus; at
  * production nprobe, no cross-shard masking — every true union-top-k
  * neighbor the HOME shard's own serve finds survives the federated
  * merge (distance wins are never displaced by another shard's
  * candidates); per-shard tombstones subtract from the federated
  * result exactly as from the shard's own serve. */
class AnnFederationSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf0001)

  private def ids(df: DataFrame) =
    df.select(col("query_id"), col("neighbor_id"))

  private def eq(a: DataFrame, b: DataFrame) =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("exact regime: federated serve ≡ brute-force top-k of the union corpus") {
    val a = emb.filter(col("vec_id") % 3 === 0).localCheckpoint()
    val b = emb.filter(col("vec_id") % 3 === 1).localCheckpoint()
    val queries = emb.filter(col("vec_id") % 41 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val shards = Seq((a, "graft_annfed_a", 7L), (b, "graft_annfed_b", 11L))
      .map { case (df, t, seed) =>
        val m = IvfIndex(nlist = 8, nprobe = 8, seed = seed).fit(df)
        m.saveStore(df, t, buckets = 4)
        (m, t)
      }
    val fed = ids(AnnFederation.knnAcrossIvfStores(spark, shards, queries, 10))
    val exact = ids(KnnExact.knnBatch(a.unionByName(b), queries, 10))
    assert(eq(fed, exact), "exact-regime federation diverged from brute force")
  }

  test("production nprobe: the home shard's hits are never masked by another shard") {
    val a = emb.filter(col("vec_id") % 3 === 0).localCheckpoint()
    val b = emb.filter(col("vec_id") % 3 === 1).localCheckpoint()
    val queries = emb.filter(col("vec_id") % 41 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val shards = Seq((a, "graft_annfed_pa", 7L), (b, "graft_annfed_pb", 11L))
      .map { case (df, t, seed) =>
        val m = IvfIndex(nlist = 8, nprobe = 3, seed = seed).fit(df)
        m.saveStore(df, t, buckets = 4)
        (m, t)
      }
    val exact = ids(KnnExact.knnBatch(a.unionByName(b), queries, 10))
      .localCheckpoint()
    val fed = ids(AnnFederation.knnAcrossIvfStores(spark, shards, queries, 10))
      .localCheckpoint()
    for ((m, t) <- shards) {
      // true union-top-10 neighbors this shard's own serve returned...
      val homeHits = ids(m.knnJoinStore(spark, t, queries, 10))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      // ...must all appear in the federated top-10: a true neighbor's
      // distance beats any impostor another shard can offer
      assert(homeHits.join(fed, Seq("query_id", "neighbor_id"), "left_anti")
        .isEmpty, s"a true neighbor served by $t was masked in the merge")
    }
    // and the federated recall is sane at this nprobe on this fixture
    val recall = fed.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .count().toDouble / exact.count()
    assert(recall >= 0.6, s"federated recall $recall collapsed")
  }

  test("per-shard tombstones subtract from the federated serve") {
    val a = emb.filter(col("vec_id") % 3 === 0).localCheckpoint()
    val b = emb.filter(col("vec_id") % 3 === 1).localCheckpoint()
    val queries = emb.filter(col("vec_id") % 41 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val ma = IvfIndex(nlist = 8, nprobe = 8, seed = 7L).fit(a)
    val mb = IvfIndex(nlist = 8, nprobe = 8, seed = 11L).fit(b)
    ma.saveStore(a, "graft_annfed_ta", buckets = 4)
    mb.saveStore(b, "graft_annfed_tb", buckets = 4)
    // tombstone side a's share of the current federated top lists
    val gone = ids(AnnFederation.knnAcrossIvfStores(spark,
        Seq((ma, "graft_annfed_ta"), (mb, "graft_annfed_tb")), queries, 3))
      .select(col("neighbor_id").as("vec_id")).distinct()
      .join(a.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .localCheckpoint()
    assert(gone.count() > 0, "precondition: some top hits live on shard a")
    ma.removeStore(spark, "graft_annfed_ta", gone)
    val fed = ids(AnnFederation.knnAcrossIvfStores(spark,
      Seq((ma, "graft_annfed_ta"), (mb, "graft_annfed_tb")), queries, 10))
    assert(fed.join(gone.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_semi").isEmpty,
      "a tombstoned vector survived the federated serve")
    val live = a.join(gone, Seq("vec_id"), "left_anti").unionByName(b)
    assert(eq(fed, ids(KnnExact.knnBatch(live, queries, 10))),
      "post-takedown federation diverged from brute force over the live union")
  }
}
