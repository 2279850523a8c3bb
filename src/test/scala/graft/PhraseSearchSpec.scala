package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, TextAnalysis}
import graft.sources.Tables

/** Exact-phrase BM25: the positional layer of the standing lexical
  * index (Bm25.phraseScore / buildPositional / phraseIndexed) and its
  * ride-along through the append/remove/compact lifecycle. */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  test("phraseScore: overlapping occurrences and repeated-term phrases count per start") {
    val docs = Seq(
      (1L, "a a a b"),
      (2L, "x a a y a a"),
      (3L, "b c d")).toDF("doc_id", "text")
    val got = Bm25.phraseScore(docs, Seq("a", "a"))
      .orderBy($"doc_id").collect()
    // doc 1 "a a a": starts 0 and 1 both witness offsets {0,1} — the
    // middle token belongs to BOTH occurrences (overlaps count); doc 2
    // has the two disjoint runs; doc 3 never matches and is absent
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 2L)))
    // the weight is the shared BM25 formula with the phrase as a
    // virtual term: df = 2, N = 3, avgdl = 13/3
    val n = 3.0; val df = 2.0; val avgdl = 13.0 / 3.0
    def w(tf: Double, dl: Double): Double =
      math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    assert(math.abs(got(0).getDouble(2) - w(2, 4)) < 1e-12)
    assert(math.abs(got(1).getDouble(2) - w(2, 6)) < 1e-12)
  }

  test("phraseIndexed serves phraseScore-over-live bit-for-bit, tombstones included") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    Bm25.buildIndex(docs, "graft_phrase_t1", buckets = 8)
    Bm25.buildPositional(docs, "graft_phrase_t1", buckets = 8)
    val phrase = docs.filter($"doc_id" === 1)
      .select(explode(slice(TextAnalysis.tokens($"text"), 1, 2)).as("t"))
      .as[String].collect().toSeq
    assert(phrase.length == 2)

    def collected(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect().toSeq

    // no tombstones: indexed ≡ ad-hoc on the full corpus (raw doubles —
    // the phrase weight is a single term, no float-sum reordering)
    val full = collected(Bm25.phraseScore(docs, phrase))
    assert(full.nonEmpty)
    assert(collected(Bm25.phraseIndexed(spark, "graft_phrase_t1", phrase)) === full)

    // tombstones: serve as if the deleted docs were never indexed
    Bm25.removeDocs(spark, "graft_phrase_t1",
      docs.filter(pmod($"doc_id", lit(5)) === 2).select($"doc_id"))
    val live = docs.filter(pmod($"doc_id", lit(5)) =!= 2)
    val adHocLive = collected(Bm25.phraseScore(live, phrase))
    assert(collected(Bm25.phraseIndexed(spark, "graft_phrase_t1", phrase)) === adHocLive)

    // compaction makes the deletes physical without changing scores,
    // and the positions table physically drops the tombstoned ids
    Bm25.compactIndex(spark, "graft_phrase_t1", buckets = 8)
    assert(collected(Bm25.phraseIndexed(spark, "graft_phrase_t1", phrase)) === adHocLive)
    assert(spark.table("graft_phrase_t1_positions")
      .filter(pmod($"doc_id", lit(5)) === 2).isEmpty)
  }

  test("appendDocs maintains the positional table; buildIndex drops a stale one") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val base = docs.filter(pmod($"doc_id", lit(4)) =!= 0)
    val delta = docs.filter(pmod($"doc_id", lit(4)) === 0)
    Bm25.buildIndex(base, "graft_phrase_t2", buckets = 8)
    Bm25.buildPositional(base, "graft_phrase_t2", buckets = 8)
    Bm25.appendDocs(spark, "graft_phrase_t2", delta, buckets = 8)

    Bm25.buildIndex(docs, "graft_phrase_t3", buckets = 8)
    Bm25.buildPositional(docs, "graft_phrase_t3", buckets = 8)
    val a = spark.table("graft_phrase_t2_positions")
    val b = spark.table("graft_phrase_t3_positions")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "appended positional table diverged from a fresh build")

    // a rebuild over a different corpus drops the positional table —
    // phrase serving must fail loudly, never mix snapshots
    Bm25.buildIndex(base, "graft_phrase_t3", buckets = 8)
    val boom = intercept[IllegalArgumentException] {
      Bm25.phraseIndexed(spark, "graft_phrase_t3", Seq("x"))
    }
    assert(boom.getMessage.contains("buildPositional"))
    // and buildPositional refuses a corpus that doesn't match the index
    val boom2 = intercept[IllegalArgumentException] {
      Bm25.buildPositional(docs, "graft_phrase_t3", buckets = 8)
    }
    assert(boom2.getMessage.contains("same snapshot"))
  }

  test("phraseIndexedBatch equals per-phrase serving, variable lengths included") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    Bm25.buildIndex(docs, "graft_phrase_t4", buckets = 8)
    Bm25.buildPositional(docs, "graft_phrase_t4", buckets = 8)
    def firstTokens(id: Long, n: Int): Seq[String] = docs.filter($"doc_id" === id)
      .select(explode(slice(TextAnalysis.tokens($"text"), 1, n)).as("t"))
      .as[String].collect().toSeq
    val p1 = firstTokens(1, 2); val p2 = firstTokens(2, 3)
    val ph = (p1.zipWithIndex.map { case (t, i) => (1L, i, t) } ++
      p2.zipWithIndex.map { case (t, i) => (2L, i, t) })
      .toDF("query_id", "off", "term")
    val batch = Bm25.phraseIndexedBatch(spark, "graft_phrase_t4", ph)
      .orderBy($"query_id", $"doc_id").collect().toSeq
    val singles =
      Bm25.phraseIndexed(spark, "graft_phrase_t4", p1)
        .select(lit(1L).as("query_id"), $"doc_id", $"phrase_tf", $"bm25")
        .unionByName(Bm25.phraseIndexed(spark, "graft_phrase_t4", p2)
          .select(lit(2L).as("query_id"), $"doc_id", $"phrase_tf", $"bm25"))
        .orderBy($"query_id", $"doc_id").collect().toSeq
    assert(batch.nonEmpty)
    assert(batch === singles)
    // the ad-hoc batch sibling computes the same rows from raw text
    assert(Bm25.phraseScoreBatch(docs, ph)
      .orderBy($"query_id", $"doc_id").collect().toSeq === batch)
  }

  test("streaming maintenance keeps the positional table in sync") {
    import graft.streaming.IndexMaintenance
    val name = "graft_phrase_m1"
    IndexMaintenance.initStores(spark, name)
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .localCheckpoint()
    // wave 1 bootstraps (buildIndex drops any stale positional table);
    // the positional tier is then built over the bootstrap corpus and
    // must ride every later wave through appendDocs/compactIndex
    val b1 = docs.filter($"doc_id" < 30)
    IndexMaintenance.applyUpserts(spark, name, b1, ver = 1L, buckets = 8)
    Bm25.buildPositional(b1, name, buckets = 8)
    val b2 = docs.filter($"doc_id" >= 30 && $"doc_id" < 40)
      .unionByName(docs.filter($"doc_id" === 5)
        .select($"doc_id", concat($"text", lit(" v2")).as("text")))
    IndexMaintenance.applyUpserts(spark, name, b2, ver = 2L, buckets = 8)
    val b3 = docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
      .unionByName(Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    IndexMaintenance.applyUpserts(spark, name, b3, ver = 3L, buckets = 8)

    val live = docs.filter($"doc_id" < 45 && $"doc_id" =!= 7)
      .select($"doc_id", when($"doc_id" === 5,
        concat($"text", lit(" v2"))).otherwise($"text").as("text"))
      .localCheckpoint()
    val phrase = live.filter($"doc_id" === 0)
      .select(explode(slice(TextAnalysis.tokens($"text"), 1, 2)).as("t"))
      .as[String].collect().toSeq
    // maintained positional serving (tombstones pending or not) equals
    // the ad-hoc phrase truth over the live corpus
    val adHoc = Bm25.phraseScore(live, phrase)
      .orderBy($"doc_id").collect().toSeq
    assert(adHoc.nonEmpty)
    assert(Bm25.phraseIndexed(spark, name, phrase)
      .orderBy($"doc_id").collect().toSeq === adHoc)
    // and after physical compaction the table equals a fresh build's
    Bm25.compactIndex(spark, name, buckets = 8)
    Bm25.buildIndex(live, name + "_fresh", buckets = 8)
    Bm25.buildPositional(live, name + "_fresh", buckets = 8)
    val a = spark.table(name + "_positions")
    val b = spark.table(name + "_fresh_positions")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "maintained positional table diverged from a fresh build")
  }

  test("champion tier: exact rescore, single-term completeness, drop-on-append") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    Bm25.buildIndex(docs, "graft_champ_t1", buckets = 8)
    Bm25.buildChampions(spark, "graft_champ_t1", c = 8, buckets = 8)
    val qTerms = docs.filter($"doc_id" === 1)
      .select(explode(slice(TextAnalysis.tokens($"text"), 1, 4)).as("t"))
      .distinct().as[String].collect().toSeq

    // every tiered score equals the full aggregation's for that doc at
    // the 4dp serving contract — the tier only restricts WHICH docs
    // aggregate, never what they aggregate (the two plans sum the same
    // weights in different orders, so raw doubles differ in final ULPs,
    // the repo-wide aggregate-rounding discipline)
    val tiered = Bm25.scoreIndexedTopK(spark, "graft_champ_t1", qTerms, 10)
    val full = Bm25.scoreIndexed(spark, "graft_champ_t1", qTerms)
    val joined = tiered.alias("t")
      .join(full.alias("f"), Seq("doc_id"))
      .filter(round($"t.bm25", 4) =!= round($"f.bm25", 4) ||
        $"t.n_matched" =!= $"f.n_matched")
    assert(joined.isEmpty)
    assert(tiered.count() == 10)

    // single-term query with c >= k: the champion list IS the term's
    // exact weight order, so tiered top-k == full top-k exactly
    val one = Seq(qTerms.head)
    val tieredTop = Bm25.scoreIndexedTopK(spark, "graft_champ_t1", one, 5)
      .select($"rank", $"doc_id").collect().toSeq
    val fullTop = Bm25.scoreIndexed(spark, "graft_champ_t1", one)
      .withColumn("__key", round($"bm25", 4))
      .orderBy($"__key".desc, $"doc_id").limit(5)
      .select($"doc_id").collect().toSeq
    assert(tieredTop.map(_.getLong(1)) === fullTop.map(_.getLong(0)))

    // batch form: every returned (query, doc) score equals the full
    // batch aggregation's at the 4dp contract, ranks contiguous from 1
    val queries = docs.filter($"doc_id".isin(1L, 2L))
      .select($"doc_id".as("query_id"),
        explode(slice(TextAnalysis.tokens($"text"), 1, 4)).as("term"))
    val tb = Bm25.scoreIndexedTopKBatch(spark, "graft_champ_t1", queries, 5)
      .localCheckpoint()
    val fb = Bm25.scoreIndexedBatch(spark, "graft_champ_t1", queries)
    assert(tb.alias("t")
      .join(fb.alias("f"), Seq("query_id", "doc_id"))
      .filter(round($"t.bm25", 4) =!= round($"f.bm25", 4) ||
        $"t.n_matched" =!= $"f.n_matched")
      .isEmpty)
    assert(tb.groupBy($"query_id").agg(count(lit(1)).as("n"), max($"rank").as("mx"))
      .filter($"n" =!= lit(5) || $"mx" =!= lit(5)).isEmpty)

    // a tier build over pending tombstones would bake dead docs and
    // stale weights into the champion selection — refused loudly
    Bm25.removeDocs(spark, "graft_champ_t1",
      docs.filter($"doc_id" === 3).select($"doc_id"))
    val boomTomb = intercept[IllegalArgumentException] {
      Bm25.buildChampions(spark, "graft_champ_t1", c = 8, buckets = 8)
    }
    assert(boomTomb.getMessage.contains("compactIndex first"))
    Bm25.compactIndex(spark, "graft_champ_t1", buckets = 8)

    // a bucket-spec mismatch fails BEFORE any write — a late
    // AnalysisException on the positions append would leave the index
    // physically torn (postings/doclens already grown)
    val extra = Seq((1000000L, "zz1 zz2 zz3")).toDF("doc_id", "text")
    val nPost = spark.table("graft_champ_t1_postings").count()
    val boomBuckets = intercept[IllegalArgumentException] {
      Bm25.appendDocs(spark, "graft_champ_t1", extra, buckets = 4)
    }
    assert(boomBuckets.getMessage.contains("bucketed"))
    assert(spark.table("graft_champ_t1_postings").count() == nPost,
      "refused append must not have written anything")

    // an append invalidates every weight input — the tier is dropped
    // and the next tiered serve fails loudly instead of silently stale
    Bm25.appendDocs(spark, "graft_champ_t1", extra, buckets = 8)
    val boom = intercept[IllegalArgumentException] {
      Bm25.scoreIndexedTopK(spark, "graft_champ_t1", qTerms, 10)
    }
    assert(boom.getMessage.contains("buildChampions"))
  }
}
