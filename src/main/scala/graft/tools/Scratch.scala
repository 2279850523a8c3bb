package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.TextDedup
import graft.sources.Tables

/** Disposable profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val exact = TextDedup.jaccardPairsExact(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = TextDedup.minhashPairs(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    println(s"RESULT exact=${exact.size} lsh=${lsh.size} equal=${exact == lsh} missing=${(exact -- lsh).size} extra=${(lsh -- exact).size}")
    spark.stop()
  }
}
