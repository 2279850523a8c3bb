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
    // the operator's own projection — the probe can never drift from
    // the production band layout
    val banded = TextDedup.bandedFingerprints(fp, maxHamming = 8)
    val buckets = banded.groupBy("band", "bval").agg(count(lit(1)).as("sz"))
    buckets.agg(
      sum(col("sz") * (col("sz") - 1) / 2).as("cand_pairs"),
      max(col("sz")).as("max_bucket"),
      count(lit(1)).as("n_buckets")).show(false)
    println(s"brute pairs = ${n * (n - 1) / 2}")
    spark.stop()
  }
}
