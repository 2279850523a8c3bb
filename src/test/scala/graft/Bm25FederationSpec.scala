package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, TextAnalysis}
import graft.sources.Tables

/** FEDERATED BM25 index merge (round 14): two standing indexes over
  * disjoint corpora combine in index-sized work (no corpus re-scan).
  * Certifying invariants: merged tables ≡ a one-shot build over the
  * concatenated corpora (postings/doclens are physical per-(doc, term)
  * facts; df and stats are additive under doc-disjointness), merged
  * serve ≡ ad-hoc scoring of the union at the 4dp serving contract,
  * tombstones INHERIT (no laundering through a merge), overlapping
  * sides fail loud, champions never survive a merge (weight-ordered
  * under each side's global stats — not merge-stable). */
class Bm25FederationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0001)
    .select($"doc_id", $"text")

  private def probe: Seq[String] = docs.filter($"doc_id" === 0)
    .select(explode(slice(TextAnalysis.tokens($"text"), 1, 5)).as("t"))
    .distinct().as[String].collect().toSeq

  private def rounded(df: org.apache.spark.sql.DataFrame) = df
    .select($"doc_id", $"n_matched", round($"bm25", 4).as("bm25"))
    .orderBy($"doc_id").collect().toSeq

  test("merged index ≡ one-shot build of the union: tables and serve") {
    val a = docs.filter($"doc_id" % 3 === 0)
    val b = docs.filter($"doc_id" % 3 === 1)
    Bm25.buildIndex(a, "graft_fed_ba", buckets = 8)
    Bm25.buildIndex(b, "graft_fed_bb", buckets = 8)
    Bm25.mergeIndexes(spark, "graft_fed_ba", "graft_fed_bb",
      "graft_fed_bc", buckets = 8)
    Bm25.buildIndex(a.unionByName(b), "graft_fed_bf", buckets = 8)
    for (t <- Seq("_postings", "_terms", "_doclens", "_stats")) {
      val x = spark.table("graft_fed_bc" + t)
      val y = spark.table("graft_fed_bf" + t)
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty,
        s"table $t diverged from the one-shot union build")
    }
    val merged = rounded(Bm25.scoreIndexed(spark, "graft_fed_bc", probe))
    val fresh = rounded(Bm25.score(a.unionByName(b), probe.toDF("term")))
    assert(merged === fresh)
    assert(merged.nonEmpty)
  }

  test("overlapping sides fail loud; merging into a side refuses") {
    val a = docs.filter($"doc_id" % 3 === 0)
    Bm25.buildIndex(a, "graft_fed_oa", buckets = 8)
    Bm25.buildIndex(a.limit(20), "graft_fed_ob", buckets = 8)
    val e = intercept[IllegalArgumentException] {
      Bm25.mergeIndexes(spark, "graft_fed_oa", "graft_fed_ob",
        "graft_fed_oc", buckets = 8)
    }
    assert(e.getMessage.contains("doc-disjoint"))
    intercept[IllegalArgumentException] {
      Bm25.mergeIndexes(spark, "graft_fed_oa", "graft_fed_ob",
        "graft_fed_oa", buckets = 8)
    }
  }

  test("tombstones inherit: merged serve adjusts exactly; compact settles to the live union") {
    val a = docs.filter($"doc_id" % 3 === 0)
    val b = docs.filter($"doc_id" % 3 === 1)
    Bm25.buildIndex(a, "graft_fed_ta", buckets = 8)
    Bm25.buildIndex(b, "graft_fed_tb", buckets = 8)
    val gone = a.orderBy($"doc_id").limit(5).select($"doc_id")
      .localCheckpoint()
    Bm25.removeDocs(spark, "graft_fed_ta", gone)
    Bm25.mergeIndexes(spark, "graft_fed_ta", "graft_fed_tb",
      "graft_fed_tc", buckets = 8)
    val goneIds = gone.as[Long].collect().toSet
    val live = a.unionByName(b).filter(!$"doc_id".isin(goneIds.toSeq: _*))
    // the inherited tombstones adjust the merged serve exactly
    val served = rounded(Bm25.scoreIndexed(spark, "graft_fed_tc", probe))
    val truth = rounded(Bm25.score(live, probe.toDF("term")))
    assert(served === truth, "merged serve must exclude inherited tombstones")
    // settle: compacted merged index ≡ one-shot build of the live union
    Bm25.compactIndex(spark, "graft_fed_tc", buckets = 8)
    Bm25.buildIndex(live, "graft_fed_tf", buckets = 8)
    for (t <- Seq("_postings", "_terms", "_doclens", "_stats")) {
      val x = spark.table("graft_fed_tc" + t)
      val y = spark.table("graft_fed_tf" + t)
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty,
        s"post-compact $t diverged from the live-union build")
    }
  }

  test("a merged index is a first-class index: appendDocs folds a delta exactly") {
    val a = docs.filter($"doc_id" % 3 === 0)
    val b = docs.filter($"doc_id" % 3 === 1)
    val delta = docs.filter($"doc_id" % 3 === 2).limit(20).localCheckpoint()
    Bm25.buildIndex(a, "graft_fed_pa", buckets = 8)
    Bm25.buildIndex(b, "graft_fed_pb", buckets = 8)
    Bm25.mergeIndexes(spark, "graft_fed_pa", "graft_fed_pb",
      "graft_fed_pc", buckets = 8)
    Bm25.appendDocs(spark, "graft_fed_pc", delta, buckets = 8)
    Bm25.buildIndex(a.unionByName(b).unionByName(delta),
      "graft_fed_pf", buckets = 8)
    for (t <- Seq("_postings", "_terms", "_doclens", "_stats")) {
      val x = spark.table("graft_fed_pc" + t)
      val y = spark.table("graft_fed_pf" + t)
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty,
        s"append-on-merged $t diverged from the one-shot build")
    }
  }

  test("empty-side merge is the identity: a shard that indexed nothing yet") {
    val a = docs.filter($"doc_id" % 3 === 0)
    Bm25.buildIndex(a, "graft_fed_ea", buckets = 8)
    Bm25.buildIndex(a.limit(0), "graft_fed_eb", buckets = 8)
    Bm25.mergeIndexes(spark, "graft_fed_ea", "graft_fed_eb",
      "graft_fed_ec", buckets = 8)
    for (t <- Seq("_postings", "_terms", "_doclens", "_stats")) {
      val x = spark.table("graft_fed_ec" + t)
      val y = spark.table("graft_fed_ea" + t)
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty,
        s"empty ⊕ x diverged from x at $t")
    }
    val merged = rounded(Bm25.scoreIndexed(spark, "graft_fed_ec", probe))
    assert(merged === rounded(Bm25.scoreIndexed(spark, "graft_fed_ea", probe)))
    assert(merged.nonEmpty)
  }

  test("derived tiers: champions always dropped; positions merge iff both sides have them") {
    val a = docs.filter($"doc_id" % 3 === 0)
    val b = docs.filter($"doc_id" % 3 === 1)
    Bm25.buildIndex(a, "graft_fed_da", buckets = 8)
    Bm25.buildIndex(b, "graft_fed_db", buckets = 8)
    Bm25.buildChampions(spark, "graft_fed_da", c = 4, buckets = 8)
    Bm25.buildPositional(a, "graft_fed_da", buckets = 8)
    Bm25.mergeIndexes(spark, "graft_fed_da", "graft_fed_db",
      "graft_fed_dc", buckets = 8)
    assert(!spark.catalog.tableExists("graft_fed_dc_champions"),
      "champions are weight-ordered under per-side stats — must not survive")
    assert(!spark.catalog.tableExists("graft_fed_dc_positions"),
      "positions on ONE side only must not ride into the merge")
    // both sides positional → merged positions ≡ one-shot positional build
    Bm25.buildPositional(b, "graft_fed_db", buckets = 8)
    Bm25.mergeIndexes(spark, "graft_fed_da", "graft_fed_db",
      "graft_fed_dc", buckets = 8)
    Bm25.buildIndex(a.unionByName(b), "graft_fed_df", buckets = 8)
    Bm25.buildPositional(a.unionByName(b), "graft_fed_df", buckets = 8)
    val x = spark.table("graft_fed_dc_positions")
    val y = spark.table("graft_fed_df_positions")
    assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty,
      "merged positions diverged from the one-shot positional build")
  }
}
