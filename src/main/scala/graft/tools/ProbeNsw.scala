package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One-shot NSW scale ledger (q199's backend at sf0.1): build and
  * serve wall time + recall vs exact, across shard counts and beam
  * widths — the shard-sizing guidance ARCHITECTURE.md quotes (shards
  * are the parallelism unit: more shards = faster parallel build and
  * smaller per-executor graphs, at the cost of searching every shard
  * per query batch). */
object ProbeNsw {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    val e = Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = e.count()
    val queries = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val nq = queries.count()
    println(s"corpus=$n queries=$nq")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val truth = pairs(graft.operators.KnnExact.knnBatch(e, queries, 10))
    println(f"exact batch: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def rec(p: Set[(Long, Long)]): Double = (p & truth).size.toDouble / truth.size
    for (shards <- Seq(8, 32)) {
      val b0 = System.nanoTime()
      val model = graft.ann.NswGraph(m = 12, efConstruction = 64,
        numShards = shards, seed = 42L).fit(e, "vec_id", "embedding")
      val bs = (System.nanoTime() - b0) / 1e9
      for (ef <- Seq(32, 80)) {
        // warm twice, report the min (bench discipline)
        val times = Seq.fill(2) {
          val s0 = System.nanoTime()
          val p = pairs(model.knnJoin(queries, topK = 10, ef = ef))
          ((System.nanoTime() - s0) / 1e9, p)
        }
        val (ts, p) = times.minBy(_._1)
        println(f"NSW shards=$shards%2d ef=$ef%3d build=$bs%6.1fs " +
          f"serve=$ts%5.2fs recall=${rec(p)}%.3f")
      }
    }
    spark.stop()
  }
}
