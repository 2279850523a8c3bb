package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, Takedown}
import graft.sources.Tables

class TakedownSpec extends SparkSpec {
  import spark.implicits._

  test("joinSizeChecked: exact on hand data, never-under + bound bits hold, tight at real scale") {
    import graft.operators.SkewJoin
    // hand case: keys {x:2, y:1} ⋈ {x:3, z:5} → exact 6
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "x", "x", "z", "z", "z", "z", "z").toDF("k")
    val r = SkewJoin.joinSizeChecked(a, b, "k", "k").head()
    assert(r.getAs[Long]("exact_join_rows") === 6L)
    assert(r.getAs[Int]("never_under") === 1 && r.getAs[Int]("bound_ok") === 1)
    // with width >> distinct keys, no collisions → estimate EXACT
    assert(r.getAs[Long]("est_join_rows") === 6L)
    // real tables: the estimate stays within the theoretical slack and
    // the guarantee bits hold
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    val big = SkewJoin.joinSizeChecked(li, ord, "l_orderkey", "o_orderkey").head()
    assert(big.getAs[Int]("never_under") === 1 && big.getAs[Int]("bound_ok") === 1)
    assert(big.getAs[Long]("exact_join_rows") === li.count())
  }

  test("join-size/skew edge cases: null keys, empty sides, name collisions") {
    import graft.operators.SkewJoin
    // null keys never match — the bound must survive a null-heavy side
    val a = (Seq.fill(500)(None: Option[Long]) ++ (1L to 50L).map(Some(_)))
      .toDF("k")
    val b = (1L to 50L).map(Some(_)).toDF("k")
    val r = SkewJoin.joinSizeChecked(a, b, "k", "k").head()
    assert(r.getAs[Long]("exact_join_rows") === 50L)
    assert(r.getAs[Int]("never_under") === 1 && r.getAs[Int]("bound_ok") === 1)
    // empty side → defined zeros, not nulls
    val e = SkewJoin.joinSizeChecked(
      spark.emptyDataset[Long].toDF("k"), b, "k", "k").head()
    assert(e.getAs[Long]("est_join_rows") === 0L)
    assert(e.getAs[Int]("never_under") === 1 && e.getAs[Int]("bound_ok") === 1)
    // estimate-only never references the exact join
    val est = SkewJoin.joinSizeEstimate(a, b, "k", "k")
    assert(est.columns.toSeq === Seq("n_a", "n_b", "est_join_rows"))
    // a key column named "n" must not collide with internals
    val named = (Seq.fill(9)(1L) ++ Seq(2L)).toDF("n")
    assert(SkewJoin.describeSkew(named, Seq("n"))
      .collect().map(r2 => r2.getString(0) -> r2.getDouble(1))
      .toMap.apply("max_key_rows") === 9.0)
    // colliding percentile labels and duplicate widths fail loudly
    intercept[IllegalArgumentException] {
      SkewJoin.describeSkew(named, Seq("n"), percentiles = Seq(0.5, 0.5))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Packing.paddingWasteCurve(
        Seq("a b").toDF("text"), "text", widths = Seq(8, 8))
    }
  }

  test("joinSizeEstimate: int-vs-bigint keys widen (never-under holds); non-numeric mismatch fails loud") {
    import graft.operators.SkewJoin
    // int side joins a bigint side — a legal equi-join after Spark's
    // coercion; the sketch must hash equal values into equal buckets
    val ai = (1 to 50).toDF("k") // IntegerType
    val bl = (1L to 50L).toDF("k") // LongType
    val r = SkewJoin.joinSizeChecked(ai, bl, "k", "k").head()
    assert(r.getAs[Long]("exact_join_rows") === 50L)
    assert(r.getAs[Int]("never_under") === 1 && r.getAs[Int]("bound_ok") === 1)
    assert(r.getAs[Long]("est_join_rows") === 50L) // width >> keys: exact
    // string-vs-long would silently under-estimate — refuse instead
    val as = Seq("1", "2").toDF("k")
    val boom = intercept[IllegalArgumentException] {
      SkewJoin.joinSizeEstimate(as, bl, "k", "k").head()
    }
    assert(boom.getMessage.contains("key types differ"))
  }

  test("describeSkew: hand-checked metrics on a 2-key skewed frame") {
    val df = (Seq.fill(9)("hot") ++ Seq("cold")).toDF("k")
    val got = graft.operators.SkewJoin.describeSkew(df, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("n_keys") === 2.0 && got("n_rows") === 10.0)
    assert(got("max_key_rows") === 9.0 && got("mean_key_rows") === 5.0)
    assert(got("p50_key_rows") === 5.0) // linear interpolation of [1, 9]
    assert(got("skew_ratio") === 1.8)
  }

  test("purgeAll cleans forest + bm25 + signature store; serving paths forget the ids") {
    val docs = Tables.documents(spark, sf0001)
    val e = Tables.embeddings(spark, sf0001)
    val purge = docs.filter(pmod($"doc_id", lit(17)) === 0)
      .select($"doc_id".as("id"))
    val purgeIds = purge.as[Long].collect().toSet

    Bm25.buildIndex(docs, "graft_takedown_bm25", buckets = 8)
    graft.streaming.IngestDedup.replayInBatches(
      docs.select($"doc_id", $"text"), "graft_takedown_sigs", nBatches = 2)
    val ann = graft.ann.DistributedAnnForest(
      numTrees = 4, maxLeafSize = 5, maxDepth = 16).fit(e)

    val sigBefore = spark.table("graft_takedown_sigs_bands").count() +
      spark.table("graft_takedown_sigs_shingles").count()
    val (newAnn, audit) = Takedown.purgeAll(spark, purge,
      Some(ann), Some("graft_takedown_bm25"), Some("graft_takedown_sigs"),
      bm25Buckets = 8)
    val rows = audit.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap

    // every store reports clean after a recount of its own rows
    assert(rows.keySet === Set("ann_forest", "bm25", "ingest_sigs"))
    rows.foreach { case (s, (_, _, clean)) => assert(clean === 1, s) }

    // forest: exactly |purged ∩ store| × trees rows gone
    val survIds = graft.operators.Dedup.exactVectors(e, "embedding", "vec_id")
      .select($"vec_id").as[Long].collect().toSet
    val hit = (purgeIds & survIds).size.toLong
    val (aBefore, aAfter, _) = rows("ann_forest")
    assert(aBefore - aAfter === hit * 4)

    // bm25: distinct indexed docs shrink by the purged count and the
    // SERVING path cannot surface a purged doc
    val (bBefore, bAfter, _) = rows("bm25")
    assert(bBefore - bAfter === purgeIds.size.toLong)
    val probeTerms = docs.filter($"doc_id".isin(purgeIds.toSeq.take(3).map(Long.box): _*))
      .select(explode(split(lower(trim($"text")), "\\s+")).as("t"))
      .filter($"t" =!= "").limit(5).as[String].collect().toSeq
    val served = Bm25.scoreIndexed(spark, "graft_takedown_bm25", probeTerms)
      .select($"doc_id").as[Long].collect().toSet
    assert(served.nonEmpty && (served & purgeIds).isEmpty)

    // forest serving: no purged id comes back as a neighbor
    val q = e.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val nn = newAnn.get.knnJoin(q, topK = 5)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(nn.nonEmpty && (nn & purgeIds).isEmpty)

    // signature store: rows fell (purged ids held signatures) and the
    // audit's before count matches the table scan
    val (sBefore, sAfter, _) = rows("ingest_sigs")
    assert(sBefore === sigBefore && sAfter < sBefore)
  }
}
