package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Synthetic-scale stress for the round-8 text operators: replicate
  * sf0.1's documents 40× (→ ~200k docs, distinct ids, per-copy token
  * salt so vocab grows too) and time DSIR weighting, the distinct-n
  * report, and both Gopher repetition rules. The point is slope, not
  * absolute numbers: all four are explode + partial-agg + vocab-or-id
  * keyed join shapes, so 40× input should cost ~linear wall time with
  * no driver involvement. */
object ProbeR12Stress {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val big = base
      .withColumn("k", explode(sequence(lit(0), lit(39))))
      .select((col("doc_id") * 40 + col("k")).as("doc_id"),
        concat(col("text"), lit(" s"), col("k")).as("text"))
      .localCheckpoint()
    println(s"STRESS docs=${big.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STRESS $name wall_s=${(System.nanoTime() - t0) / 1e9}%.2f rows=$n")
    }
    val target = big.filter(pmod(col("doc_id"), lit(17)) === 0)
    time("dsir_weights") {
      graft.operators.Dsir.importanceWeights(big, target).count()
    }
    time("dsir_weights_hashed") {
      graft.operators.Dsir.importanceWeightsHashed(big, target).count()
    }
    time("distinct_ngrams") {
      graft.operators.TextAnalysis.distinctNgrams(
        big.withColumn("source", pmod(col("doc_id"), lit(20))), "source", "text")
        .count()
    }
    time("top_ngram") {
      graft.operators.TextAnalysis.topNgramCharFraction(
        big, "doc_id", "text", 2).count()
    }
    time("dup_ngram") {
      graft.operators.TextAnalysis.dupNgramCharFraction(
        big, "doc_id", "text", 2).count()
    }
    spark.stop()
  }
}
