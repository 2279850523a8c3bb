package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Bm25, TextAnalysis}
import graft.streaming.IndexMaintenance
import graft.sources.Tables

class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // scripted upsert schedule: adds in three waves, wave 2 also carries
  // in-place CHANGES of wave-1 docs and explicit DELETE markers
  private def isChanged(c: org.apache.spark.sql.Column) =
    pmod(c, lit(3)) === 0 && pmod(c, lit(5)) === 0
  private def isDeleted(c: org.apache.spark.sql.Column) =
    pmod(c, lit(3)) === 0 && pmod(c, lit(7)) === 0 && pmod(c, lit(5)) =!= 0

  private def schedule(docs: DataFrame): Seq[DataFrame] = Seq(
    docs.filter(pmod($"doc_id", lit(3)) === 0),
    docs.filter(pmod($"doc_id", lit(3)) === 1)
      .unionByName(docs.filter(isChanged($"doc_id"))
        .withColumn("text", concat($"text", lit(" v2"))))
      .unionByName(docs.filter(isDeleted($"doc_id"))
        .withColumn("text", lit(null).cast("string"))),
    docs.filter(pmod($"doc_id", lit(3)) === 2))

  private def finalCorpus(docs: DataFrame): DataFrame = docs
    .filter(!isDeleted($"doc_id"))
    .withColumn("text", when(isChanged($"doc_id"),
      concat($"text", lit(" v2"))).otherwise($"text"))

  private def probeTerms(corpus: DataFrame): Seq[String] = corpus
    .orderBy($"doc_id").limit(1)
    .select(explode(slice(TextAnalysis.tokens($"text"), 1, 5)).as("t"))
    .distinct().as[String].collect().toSeq

  private def rounded(df: DataFrame): Seq[org.apache.spark.sql.Row] = df
    .select($"doc_id", $"n_matched", round($"bm25", 4).as("bm25"))
    .orderBy($"doc_id").collect().toSeq

  test("applyUpserts schedule: maintained store == fresh build over the final corpus") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").localCheckpoint()
    IndexMaintenance.initStores(spark, "graft_im_r")
    val deltas = schedule(docs).zipWithIndex.map { case (b, k) =>
      IndexMaintenance.applyUpserts(spark, "graft_im_r", b, ver = k + 1L,
        buckets = 8)
    }
    // classification counts match the schedule's construction
    val counts = deltas.reduce(_.unionByName(_))
      .groupBy($"status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every doc is added exactly once (deleted ones were still added in
    // wave 1); adds minus removes = the final live count
    assert(counts("added") === docs.count(), counts.toString)
    assert(counts("changed") === docs.filter(isChanged($"doc_id")).count())
    assert(counts("removed") === docs.filter(isDeleted($"doc_id")).count())
    assert(counts("added") - counts("removed") === finalCorpus(docs).count())
    assert(!counts.contains("unchanged"))

    val corpus = finalCorpus(docs).localCheckpoint()
    val probe = probeTerms(corpus)
    assert(rounded(Bm25.scoreIndexed(spark, "graft_im_r", probe)) ===
      rounded(Bm25.score(corpus, probe.toDF("term"))))

    // after normalizing physical state, tables equal a fresh build's
    Bm25.compactIndex(spark, "graft_im_r", buckets = 8)
    IndexMaintenance.compactFingerprints(spark, "graft_im_r")
    Bm25.buildIndex(corpus, "graft_im_f", buckets = 8)
    for (t <- Seq("_postings", "_terms", "_doclens", "_stats")) {
      val a = spark.table("graft_im_r" + t)
      val b = spark.table("graft_im_f" + t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"table $t diverged")
    }
    // the compacted fingerprint log holds exactly the live ids
    assert(spark.table("graft_im_r_fplog").select($"doc_id").as[Long]
      .collect().toSet === corpus.select($"doc_id").as[Long].collect().toSet)

    // replay protection: re-sending an old version fails loudly
    val boom = intercept[IllegalArgumentException] {
      IndexMaintenance.applyUpserts(spark, "graft_im_r",
        docs.filter(pmod($"doc_id", lit(3)) === 1).limit(3), ver = 2L, buckets = 8)
    }
    assert(boom.getMessage.contains("strictly increasing"))
  }

  test("foreachBatch stream == batch replay; ANN leg folds the same delta") {
    // corpus with vectors: embeddings fixture + a deterministic 1-token text
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id".as("doc_id"),
        concat(lit("tok"), pmod($"vec_id", lit(13))).as("text"), $"embedding")
      .localCheckpoint()
    val batches = schedule(e)

    IndexMaintenance.initStores(spark, "graft_im_s")
    // seed: batch 1 applied batch-mode (the model needs a corpus to fit)
    IndexMaintenance.applyUpserts(spark, "graft_im_s", batches.head,
      ver = 1L, buckets = 8)
    val ref = new java.util.concurrent.atomic.AtomicReference(
      graft.ann.DistributedAnnForest(numTrees = 2, maxLeafSize = 64, seed = 7L)
        .fit(batches.head.select($"doc_id", $"embedding"), idCol = "doc_id"))

    val dir = java.nio.file.Files.createTempDirectory("graft_im_stream").toString
    def write(b: DataFrame) = b.repartition(1).write.mode("append").parquet(dir)
    write(batches(1))
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val statuses = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = IndexMaintenance.maintainStream(stream, "graft_im_s",
        (delta, _) => delta.collect().foreach(r =>
          statuses.add((r.getString(1), r.getLong(0)))),
        buckets = 8, annRef = Some(ref), verBase = 2L)
      .start()
    q.processAllAvailable()
    write(batches(2))
    q.processAllAvailable()
    q.stop()

    // BM25 leg: streaming-applied store serves == ad-hoc over the final
    // corpus (and therefore == the batch replay, proven equal above)
    val corpus = finalCorpus(e).localCheckpoint()
    val probe = probeTerms(corpus)
    assert(rounded(Bm25.scoreIndexed(spark, "graft_im_s", probe)) ===
      rounded(Bm25.score(corpus, probe.toDF("term"))))

    // ANN leg: the folded model holds exactly the live ids, and serves
    // none of the deleted ones
    val liveIds = corpus.select($"doc_id").as[Long].collect().toSet
    val modelIds = ref.get.corpusBuckets.select($"neighbor_id").as[Long]
      .collect().toSet
    assert(modelIds === liveIds)
    val served = ref.get.knnJoin(
        e.limit(4).select($"doc_id".as("query_id"), $"embedding".as("qvec")),
        topK = 5)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(served.subsetOf(liveIds) && served.nonEmpty)

    // the stream classified changes/deletes, not just adds
    val byStatus = statuses.toArray(Array.empty[(String, Long)])
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(byStatus.getOrElse("changed", 0) ===
      e.filter(isChanged($"doc_id")).count().toInt)
    assert(byStatus.getOrElse("removed", 0) ===
      e.filter(isDeleted($"doc_id")).count().toInt)
  }
}
