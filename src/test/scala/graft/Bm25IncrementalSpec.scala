package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, SnapshotDiff, TextAnalysis}
import graft.sources.Tables

class Bm25IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("appendDocs: delta-maintained index serves identically to a fresh build") {
    val docs = Tables.documents(spark, sf0001)
    val old = docs.filter(pmod($"doc_id", lit(7)) =!= 0)
    val neu = docs.filter(pmod($"doc_id", lit(11)) =!= 0)
      .withColumn("text", when(pmod($"doc_id", lit(5)) === 0,
        concat($"text", lit(" v2"))).otherwise($"text"))
    Bm25.buildIndex(old, "graft_incr_t1", buckets = 8)
    val delta = SnapshotDiff.diff(old, neu, "doc_id", Seq("text")).localCheckpoint()
    Bm25.removeDocs(spark, "graft_incr_t1",
      delta.filter($"status".isin("removed", "changed")).select($"doc_id"))
    Bm25.compactIndex(spark, "graft_incr_t1", buckets = 8)
    Bm25.appendDocs(spark, "graft_incr_t1",
      neu.join(delta.filter($"status".isin("added", "changed"))
        .select($"doc_id"), Seq("doc_id"), "left_semi"), buckets = 8)

    val probe = neu.filter($"doc_id" === 1)
      .select(explode(slice(TextAnalysis.tokens($"text"), 1, 5)).as("t"))
      .distinct().as[String].collect().toSeq
    // ad-hoc scoring over the new drop is the in-engine truth (q78's
    // specced score ≡ scoreIndexed equivalence, now through the
    // remove→compact→append lifecycle). Compare at the 4dp serving
    // contract — the two plans sum per-term weights in different
    // orders, so raw doubles differ in final ULPs (the repo-wide
    // aggregate-rounding discipline).
    def rounded(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_matched", round($"bm25", 4).as("bm25"))
      .orderBy($"doc_id").collect().toSeq
    val incr = rounded(Bm25.scoreIndexed(spark, "graft_incr_t1", probe))
    val fresh = rounded(Bm25.score(neu, probe.toDF("term")))
    assert(incr === fresh)
    assert(incr.nonEmpty)

    // the maintained tables equal a fresh build's, table by table
    Bm25.buildIndex(neu, "graft_incr_t2", buckets = 8)
    for (t <- Seq("_postings", "_terms", "_doclens", "_stats")) {
      val a = spark.table("graft_incr_t1" + t)
      val b = spark.table("graft_incr_t2" + t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"table $t diverged")
    }
  }

  test("appendDocs: new ids append exactly under pending tombstones; physical overlap refuses") {
    val all = Tables.documents(spark, sf0001).orderBy($"doc_id").limit(60)
      .select($"doc_id", $"text").localCheckpoint()
    val ids = all.select($"doc_id").as[Long].collect().sorted
    val base = all.filter($"doc_id" <= ids(49))
    val extra = all.filter($"doc_id" > ids(49))
    Bm25.buildIndex(base, "graft_incr_t3", buckets = 8)
    val boom = intercept[IllegalArgumentException] {
      Bm25.appendDocs(spark, "graft_incr_t3", base.limit(5), buckets = 8)
    }
    assert(boom.getMessage.contains("physically indexed"))
    // tombstone 5 docs, then append NEW ids WITHOUT compacting — the
    // round-8 relaxation a streaming maintenance loop needs; the served
    // scores must equal ad-hoc over the live corpus exactly
    Bm25.removeDocs(spark, "graft_incr_t3",
      all.filter($"doc_id" <= ids(4)).select($"doc_id"))
    Bm25.appendDocs(spark, "graft_incr_t3", extra, buckets = 8)
    val live = base.filter($"doc_id" > ids(4)).unionByName(extra)
    val probe = extra.orderBy($"doc_id").limit(1)
      .select(explode(slice(TextAnalysis.tokens($"text"), 1, 5)).as("t"))
      .distinct().as[String].collect().toSeq
    def rounded(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_matched", round($"bm25", 4).as("bm25"))
      .orderBy($"doc_id").collect().toSeq
    val got = rounded(Bm25.scoreIndexed(spark, "graft_incr_t3", probe))
    assert(got === rounded(Bm25.score(live, probe.toDF("term"))))
    assert(got.nonEmpty)
    // resurrecting a TOMBSTONED id still refuses (its old rows are
    // physical — the serving anti-join would hide the new ones too)
    val res = intercept[IllegalArgumentException] {
      Bm25.appendDocs(spark, "graft_incr_t3",
        all.filter($"doc_id" === ids(0)), buckets = 8)
    }
    assert(res.getMessage.contains("physically indexed"))
  }

  test("delete-everything-before-compaction serves the EMPTY frame, not null scores") {
    // the 0/0 avgdl case: every indexed doc tombstoned at once — the
    // adjusted stats drop to zero docs, and serving must come back
    // empty (the truth over an empty live corpus), never as rows with
    // silently-null bm25
    val docs = Tables.documents(spark, sf0001).limit(20).localCheckpoint()
    Bm25.buildIndex(docs, "graft_incr_t8", buckets = 4)
    Bm25.buildPositional(docs, "graft_incr_t8", buckets = 4)
    Bm25.removeDocs(spark, "graft_incr_t8", docs.select($"doc_id"))
    val probe = docs.orderBy($"doc_id").limit(1)
      .select(explode(slice(TextAnalysis.tokens($"text"), 1, 3)).as("t"))
      .distinct().as[String].collect().toSeq
    val scored = Bm25.scoreIndexed(spark, "graft_incr_t8", probe)
    assert(scored.isEmpty, "all-tombstoned index served rows")
    assert(scored.columns.toSeq === Seq("doc_id", "n_matched", "bm25"))
    val phrase = Bm25.phraseIndexed(spark, "graft_incr_t8", probe.take(2))
    assert(phrase.isEmpty, "all-tombstoned phrase serve returned rows")
    // and compaction after the wipe still leaves a servable (empty) index
    Bm25.compactIndex(spark, "graft_incr_t8", buckets = 4)
    assert(Bm25.scoreIndexed(spark, "graft_incr_t8", probe).isEmpty)
  }
}
