package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.TextDedup
import graft.sources.Tables

/** Diagnostic: band-bucket skew of the SimHash banded pair join on the
  * fixture corpus (natural-language simhash bits are biased; this
  * measures the Σ|bucket|² candidate cost vs n²/2 brute). */
object ProbeBands {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    val docs = Tables.documents(spark, sf)
    val fp = docs.select(col("doc_id").as("id"),
      TextDedup.simhash(col("text"), 2).as("fp")).localCheckpoint()
    val n = fp.count()
    val nBands = 9
    val banded = fp.select(col("id"), explode(array(
      (0 until nBands).map { i =>
        val lo = i * 64 / nBands; val hi = (i + 1) * 64 / nBands
        struct(lit(i).as("band"), shiftrightunsigned(col("fp"), lo)
          .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bval"))
      }: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bval").as("bval"))
    val buckets = banded.groupBy("band", "bval").agg(count(lit(1)).as("sz"))
    buckets.agg(
      sum(col("sz") * (col("sz") - 1) / 2).as("cand_pairs"),
      max(col("sz")).as("max_bucket"),
      count(lit(1)).as("n_buckets")).show(false)
    println(s"brute pairs = ${n * (n - 1) / 2}")
    spark.stop()
  }
}
