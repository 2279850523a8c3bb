package graft.tools

import org.apache.spark.sql.functions._

/** One-shot: the q171 recall margin at both gate fixtures (the floor
  * in the query must sit comfortably under the seeded deterministic
  * value at every sf the gate runs). */
object ProbeGatedAnn {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      import graft.streaming.IndexMaintenance
      val idx = "graft_pga_idx"; val sig = "graft_pga_sigs"
      IndexMaintenance.initStores(spark, idx)
      graft.streaming.IngestDedup.initStore(spark, sig)
      graft.sources.Sinks.dropTable(spark, sig + "_pending_rm")
      val corpus = graft.sources.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
        .join(graft.sources.Tables.embeddings(spark, d)
          .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
        .localCheckpoint()
      val maxId = corpus.agg(max(col("doc_id"))).head().getLong(0)
      val step = (maxId + 3) / 3
      def wave(k: Int) = corpus
        .filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
      val d1 = IndexMaintenance.applyGatedUpserts(spark, idx, sig, wave(0),
        ver = 1L, buckets = 8)
      val ref = new java.util.concurrent.atomic.AtomicReference(
        graft.ann.DistributedAnnForest(numTrees = 4, maxLeafSize = 64, seed = 99L)
          .fit(corpus.join(d1.filter(col("status") === "added")
              .select(col("doc_id")), Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("embedding")), idCol = "doc_id"))
      for (k <- 1 until 3)
        IndexMaintenance.applyGatedUpserts(spark, idx, sig, wave(k),
          ver = k + 1L, buckets = 8, annRef = Some(ref))
      val live3 = spark.table(idx + "_doclens").select(col("doc_id")).localCheckpoint()
      val edits = corpus.join(live3, Seq("doc_id"), "left_semi")
        .filter(pmod(col("doc_id"), lit(10)) === 1)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          col("embedding"))
      val dels = live3.filter(pmod(col("doc_id"), lit(10)) === 2)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(null).cast("array<float>").as("embedding"))
      IndexMaintenance.applyGatedUpserts(spark, idx, sig,
        edits.unionByName(dels), ver = 4L, buckets = 8, annRef = Some(ref))
      val model = ref.get
      val tomb =
        if (spark.catalog.tableExists(idx + "_tombstones"))
          spark.table(idx + "_tombstones").select(col("doc_id"))
        else spark.range(0).select(col("id").as("doc_id"))
      val liveIds = spark.table(idx + "_doclens").select(col("doc_id"))
        .join(tomb, Seq("doc_id"), "left_anti").localCheckpoint()
      val liveCorpus = corpus.join(liveIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("vec_id"), col("embedding")).localCheckpoint()
      val queries = liveCorpus.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val exact = graft.operators.KnnExact.knnBatch(liveCorpus, queries, 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      val hits = model.knnJoin(queries, topK = 5)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
      val total = exact.count()
      println(f"SF=$d recall=${hits.toDouble / total}%.3f hits=$hits total=$total")
    }
    spark.stop()
  }
}
