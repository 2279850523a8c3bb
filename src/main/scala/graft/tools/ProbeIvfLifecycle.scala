package graft.tools

import org.apache.spark.sql.functions._

/** One-shot: recall margins of the q172 lifecycle stores at both gate
  * fixtures (floors must sit under the seeded deterministic values). */
object ProbeIvfLifecycle {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    import graft.ann.{IvfIndex, PqIndex}
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = graft.sources.Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val initial = e.filter(col("vec_id") < 300)
      val delta = e.filter(col("vec_id") >= 300)
      val removedIds = e.filter(pmod(col("vec_id"), lit(10)) === 3)
        .select(col("vec_id")).localCheckpoint()
      val liveCorpus = e.filter(pmod(col("vec_id"), lit(10)) =!= 3).localCheckpoint()
      val queries = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        .localCheckpoint()
      val exact = graft.operators.KnnExact.knnBatch(liveCorpus, queries, 10)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      def recall(got: org.apache.spark.sql.DataFrame): Double =
        got.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id")).count()
          .toDouble / exact.count()
      val ivf = IvfIndex(nlist = 16, nprobe = 6, seed = 42L).fit(initial)
      ivf.saveStore(initial, "graft_pil_ivf", buckets = 8)
      ivf.appendStore(delta, "graft_pil_ivf", buckets = 8)
      ivf.removeStore(spark, "graft_pil_ivf", removedIds)
      ivf.compactStore(spark, "graft_pil_ivf", buckets = 8)
      val rIvf = recall(ivf.knnJoinStore(spark, "graft_pil_ivf", queries, 10))
      val pq = PqIndex(m = 16, seed = 42L).fit(initial)
      pq.saveCorpusIvf(ivf, initial, "graft_pil_pq", buckets = 8)
      pq.appendCorpusIvf(ivf, delta, "graft_pil_pq", buckets = 8)
      pq.removeCorpusIvf(spark, "graft_pil_pq", removedIds)
      pq.compactCorpusIvf(spark, "graft_pil_pq", buckets = 8)
      val rPq = recall(pq.knnJoinIvfIndexed(spark, ivf, "graft_pil_pq", queries, 10))
      println(f"SF=$d ivf_recall=$rIvf%.3f pq_recall=$rPq%.3f nq=${queries.count()}")
    }
    spark.stop()
  }
}
