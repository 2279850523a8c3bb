package graft

import org.apache.spark.sql.functions._
import graft.streaming.IngestDedup
import graft.operators.TextDedup

class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  // token-set (ngram=1) corpus engineered for threshold 0.5:
  //   0 {t1 t2 t3} ~ 1 {t2 t3 t4} (jac 2/4) ~ 2 {t3 t4 t5} (jac 2/4),
  //   while 0 !~ 2 (jac 1/5) — the a~b, b~c, a!~c chain
  //   3 = copy of 0 (cross-batch dup), 4 unique, 5 = copy of 4 (in-batch dup)
  private val docs = Seq(
    (0L, "t1 t2 t3"), (1L, "t2 t3 t4"), (2L, "t3 t4 t5"),
    (3L, "t1 t2 t3"), (4L, "u1 u2 u3"), (5L, "u1 u2 u3"))

  private def admitted(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("seen-store semantics: rejected docs still reject later arrivals; batching-independent") {
    val d = docs.toDF("doc_id", "text")
    val r3 = admitted(IngestDedup.replayInBatches(
      d, "graft_ingest_t1", nBatches = 3, ngram = 1, numHashes = 32, bands = 32))
    // 1 rejected by 0; 2 rejected by SEEN (not admitted) 1 — greedy-admitted
    // semantics would admit 2, seen-store must not; 3 dups 0 cross-batch;
    // 5 dups 4 in-batch
    assert(r3 === Set(0L, 4L))
    // brute-force truth: admitted = later side of no exact-Jaccard pair
    val rejTruth = TextDedup.jaccardPairsExact(d, "doc_id", "text", 1, 0.5)
      .select("id_b").as[Long].collect().toSet
    assert(r3 === docs.map(_._1).toSet.diff(rejTruth))
    // any batching of the id-ordered stream yields the same admitted set
    val r1 = admitted(IngestDedup.replayInBatches(
      d, "graft_ingest_t2", nBatches = 1, ngram = 1, numHashes = 32, bands = 32))
    assert(r1 === r3)
  }

  test("removeFromStore forgets: a deleted doc's lookalike is admissible again") {
    val d = docs.toDF("doc_id", "text")
    // seed the store with doc 0; its copy (doc 3) is rejected
    IngestDedup.initStore(spark, "graft_ingest_rm")
    assert(admitted(IngestDedup.admitBatch(
      d.filter($"doc_id" === 0), "graft_ingest_rm",
      ngram = 1, numHashes = 32, bands = 32)) === Set(0L))
    assert(admitted(IngestDedup.admitBatch(
      d.filter($"doc_id" === 3), "graft_ingest_rm",
      ngram = 1, numHashes = 32, bands = 32)) === Set())
    // takedown of doc 0 (doc 3 was also seen — remove it too, it joined
    // the store despite rejection); a fresh copy is now admissible
    IngestDedup.removeFromStore(spark, "graft_ingest_rm",
      Seq(0L, 3L).toDF("doc_id"))
    assert(admitted(IngestDedup.admitBatch(
      Seq((9L, "t1 t2 t3")).toDF("doc_id", "text"), "graft_ingest_rm",
      ngram = 1, numHashes = 32, bands = 32)) === Set(9L))
    // unrelated survivors still reject their own lookalikes
    assert(admitted(IngestDedup.admitBatch(
      d.filter($"doc_id" === 4), "graft_ingest_rm",
      ngram = 1, numHashes = 32, bands = 32)) === Set(4L))
    assert(admitted(IngestDedup.admitBatch(
      Seq((10L, "u1 u2 u3")).toDF("doc_id", "text"), "graft_ingest_rm",
      ngram = 1, numHashes = 32, bands = 32)) === Set())
  }

  test("foreachBatch stream admits the same set as the batch replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_stream").toString
    def write(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").repartition(1).write.mode("append").parquet(dir)
    write(docs.slice(0, 2))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    IngestDedup.initStore(spark, "graft_ingest_t3")
    val q = IngestDedup.ingestStream(stream, "graft_ingest_t3",
        (adm, _) => adm.select("id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().foreach(got.add),
        ngram = 1, numHashes = 32, bands = 32)
      .start()
    q.processAllAvailable()
    write(docs.slice(2, 4))
    q.processAllAvailable()
    write(docs.slice(4, 6))
    q.processAllAvailable()
    q.stop()
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet === Set(0L, 4L))
  }

  test("vector ingest: admitted set equals brute-force seen-store truth; stream == replay") {
    import graft.streaming.VectorIngest
    import graft.sources.Tables
    val e = Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
    val truthRej = TextDedup.cosineNearDupPairs(e, "vec_id", "embedding", 0.4)
      .select("id_b").as[Long].collect().toSet
    val truth = e.select("vec_id").as[Long].collect().toSet.diff(truthRej)
    val replayed = VectorIngest.replayInBatches(e, nBatches = 3, minCos = 0.4)
      .select("id").as[Long].collect().toSet
    assert(replayed === truth,
      s"replay diverged from brute truth by ±${(replayed.diff(truth) ++ truth.diff(replayed)).size}")
    // the foreachBatch wiring admits the same set (2 id-ordered files)
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_ingest").toString
    val mid = 250L
    e.filter($"vec_id" < mid).repartition(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = VectorIngest.ingestStream(stream,
        (adm, _) => adm.select("id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().foreach(got.add),
        minCos = 0.4)
      .start()
    q.processAllAvailable()
    e.filter($"vec_id" >= mid).repartition(1).write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet === truth)
  }

  test("cross-batch probe: broadcast band join, no In-literal key list in the plan") {
    val d = docs.toDF("doc_id", "text")
    IngestDedup.initStore(spark, "graft_ingest_t4")
    IngestDedup.admitBatch(d.filter($"doc_id" < 3), "graft_ingest_t4",
      ngram = 1, numHashes = 32, bands = 32)
    // rebuild the batch-side frames exactly as admitBatch does and
    // inspect the LAZY cross-batch probe plan (the frame admitBatch
    // returns is checkpoint-settled, its lineage gone)
    val batch = d.filter($"doc_id" >= 3)
    val b = batch.select(
      $"doc_id".cast("long").as("id"),
      TextDedup.shingleHashes($"text", 1).as("sh"),
      TextDedup.minhashSignature(TextDedup.shingleHashes($"text", 1), 32, 42L).as("sig"))
    val bandRows = b
      .select($"id", explode(TextDedup.lshBands($"sig", 32, 1)).as("band"))
      .select($"id", $"band.band_id", $"band.band_key")
    val rej = IngestDedup.crossBatchRejections(
      spark, "graft_ingest_t4", bandRows, b, 0.5)
    // the plan must not carry collected band keys as literals: a large
    // micro-batch would inflate the PLAN (analysis/codegen blowup)
    // instead of flowing through the data plane
    val opt = rej.queryExecution.optimizedPlan.toString
    assert(!opt.contains(" IN ("), "literal In over band keys:\n" + opt)
    assert(!opt.contains("INSET"), "literal InSet over band keys:\n" + opt)
    // the store-side probe is a broadcast hash join (store never shuffled)
    val phys = rej.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys)
    assert(!phys.contains("SortMergeJoin"), "store side must not sort-merge:\n" + phys)
    // and it still finds the cross-batch duplicate (doc 3 copies doc 0)
    assert(rej.select("id").as[Long].collect().toSet === Set(3L))
  }

  test("a store persisted before generation tags fails LOUDLY, not with an unresolved column") {
    // simulate a pre-round-9 store: band/shingle tables without the
    // `ver` column. The generation-aware exclusion must refuse with a
    // message naming the rebuild, not die in an AnalysisException.
    graft.sources.Sinks.dropTable(spark, "graft_legacy_bands")
    graft.sources.Sinks.dropTable(spark, "graft_legacy_shingles")
    Seq((0, 1L, 2L)).toDF("band_id", "band_key", "id")
      .write.saveAsTable("graft_legacy_bands")
    Seq((2L, Seq(1L))).toDF("id", "sh")
      .write.saveAsTable("graft_legacy_shingles")
    val batch = Seq((10L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      IngestDedup.admitBatch(batch, "graft_legacy")
    }
    assert(e.getMessage.contains("predates generation-tagged"))
  }
}
