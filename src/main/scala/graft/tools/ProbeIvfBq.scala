package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One-shot recall ledger for the IVF×BQ composition (q194's floors):
  * plain IVF (the composition's ceiling), IVF+BQ at several oversamples,
  * and flat-BQ for context — all vs exact euclidean kNN. */
object ProbeIvfBq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    val e = Tables.embeddings(spark, sfDir).localCheckpoint()
    val queries = e.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val model = graft.ann.IvfIndex(nlist = 16, nprobe = 4, seed = 42L).fit(e)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(graft.operators.KnnExact.knnBatch(e, queries, 10))
    def rec(p: Set[(Long, Long)]): Double = (p & truth).size.toDouble / truth.size
    println(f"IVF_PLAIN recall=${rec(pairs(model.knnJoin(e, queries, 10)))}%.3f")
    Seq(32, 64, 128, e.count().toInt).foreach { c =>
      val r = rec(pairs(model.knnJoinBq(e, queries, 10, c)))
      println(f"IVF_BQ c=$c recall=$r%.3f")
    }
    spark.stop()
  }
}
