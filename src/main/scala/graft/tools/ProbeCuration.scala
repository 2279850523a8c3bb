package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TextDedup}
import graft.sources.Tables

/** Round-5 probe: measured values behind q85's curation gate floors
  * (SimHash recall vs exact Jaccard pairs, langid accuracy vs the
  * fixture's ground-truth lang column) at the driver's gate SF. */
object ProbeCuration {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d).cache()
    docs.count()

    // exact Jaccard near-dup pairs (q32's op/threshold)
    val exact = TextDedup.jaccardPairsExact(docs, "doc_id", "text", ngram = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val fp = docs.select(col("doc_id"), TextDedup.simhash(col("text"), 2).as("fp"))
    val a = fp.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fp.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
    val sim = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("ham", TextDedup.hamming(col("fp_a"), col("fp_b")))
      .filter(col("ham") <= 8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    println(s"[gate] exact pairs ${exact.size}, simhash pairs ${sim.size}, " +
      s"recall ${sim.intersect(exact).size.toDouble / exact.size}")

    val preds = docs.select(col("lang"),
      TextAnalysis.languageId(col("text")).as("word_pred"),
      TextAnalysis.languageIdCharNgram(col("text")).as("ngram_pred"))
      .cache()
    val n = preds.count().toDouble
    val wordAcc = preds.filter(col("lang") === col("word_pred")).count() / n
    val ngramAcc = preds.filter(col("lang") === col("ngram_pred")).count() / n
    println(f"[gate] langid word acc $wordAcc%.4f, char-ngram acc $ngramAcc%.4f")
    preds.groupBy("lang", "word_pred").count().orderBy("lang").show(30)
    spark.stop()
  }
}
