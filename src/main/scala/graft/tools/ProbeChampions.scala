package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scale probe for impact-tiered top-k serving (round 9): on sf0.1's
  * documents, serve the same top-10 query through the full aggregation
  * (scoreIndexed + rank) and the champion tier (scoreIndexedTopK), and
  * count the rows entering each per-doc aggregation. The tier's claim
  * is candidate-boundedness: the tiered aggregation input is capped by
  * c·|terms| candidates' postings however common the query's terms get,
  * while the full path aggregates every hit — on a hot-term query the
  * gap IS the df. Wall-clock at this SF is noise-dominated (both paths
  * are sub-second); the row counts are the scale evidence. */
object ProbeChampions {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val idx = "graft_champ_probe"
    graft.operators.Bm25.buildIndex(docs, idx, buckets = 8)
    graft.operators.Bm25.buildChampions(spark, idx, c = 32, buckets = 8)

    // the five most common terms in the corpus — the adversarial query
    // for a top-k server: every term's posting list is hot
    val hot = spark.table(s"${idx}_terms").orderBy(col("df").desc, col("term"))
      .limit(5).select(col("term")).collect().map(_.getString(0)).toSeq
    println(s"CHAMP hot_terms=${hot.mkString(",")}")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (r <- 1 to 3) {
      val (fullN, tFull) = time {
        graft.operators.Bm25.rankTopK(
          graft.operators.Bm25.scoreIndexed(spark, idx, hot), 10).count()
      }
      val (tierN, tTier) = time {
        graft.operators.Bm25.scoreIndexedTopK(spark, idx, hot, 10).count()
      }
      // aggregation input sizes: hits vs candidate-restricted hits
      val hits = spark.table(s"${idx}_postings")
        .filter(col("term").isin(hot: _*)).count()
      val cand = spark.table(s"${idx}_champions")
        .filter(col("term").isin(hot: _*))
        .select(col("doc_id")).distinct()
      val candHits = spark.table(s"${idx}_postings")
        .filter(col("term").isin(hot: _*))
        .join(cand, Seq("doc_id"), "left_semi").count()
      println(f"CHAMP run=$r full_s=$tFull%.2f tiered_s=$tTier%.2f " +
        f"agg_rows_full=$hits agg_rows_tiered=$candHits rows_ratio=" +
        f"${hits.toDouble / math.max(candHits, 1)}%.1f full_n=$fullN tiered_n=$tierN")
    }
    spark.stop()
  }
}
