package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, MaxSim, TextDedup}
import graft.sources.Tables

/** Scale probe for the round-6 additions: banded vs brute SimHash
  * pairs, union-tag as-of join vs the inequality-join + per-row argmax
  * formulation, and MaxSim exact vs refined serving.
  * Run: sbt "runMain graft.tools.ProbeR6Ops [sfDir]" */
object ProbeR6Ops {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sf).cache()
    println("SCALE docs: " + docs.count())

    // --- SimHash pairs: banded (pigeonhole) vs brute cross join ---
    val nBanded = time("simhash pairs BANDED (band join + verify)") {
      TextDedup.simhashPairsBanded(docs, "doc_id", "text", 2, 8).count()
    }
    val fp = docs.select(col("doc_id"), TextDedup.simhash(col("text"), 2).as("fp"))
    val a = fp.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fp.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
    val nBrute = time("simhash pairs BRUTE (all-pairs cross)") {
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .filter(TextDedup.hamming(col("fp_a"), col("fp_b")) <= 8).count()
    }
    println(s"SCALE simhash pair sets: banded=$nBanded brute=$nBrute " +
      s"(must be equal: ${nBanded == nBrute})")

    // --- As-of join: union-tag merge vs inequality join + argmax ---
    val events = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts")).cache()
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"),
        col("o_orderkey").as("last_orderkey"),
        col("o_totalprice").as("last_totalprice")).cache()
    println("SCALE clicks: " + events.count() + ", orders: " + orders.count())
    time("as-of UNION-TAG merge (one shuffle)") {
      AsOfJoin.asOf(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("last_orderkey", "last_totalprice"), Seq("last_orderkey")).count()
    }
    time("as-of INEQUALITY join + window argmax (naive)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("last_orderkey").desc)
      events.join(orders,
          col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
          "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).count()
    }

    // --- As-of under a HOT KEY: plain (one window partition) vs
    //     time-bucketed (key × bucket parallelism) ---
    val hotLeft = spark.range(8000000).select(
      col("id").as("event_id"), lit(1L).as("k"),
      (col("id") % 1000000).as("t"))
    val hotRight = spark.range(200000).select(
      col("id").as("ver"), lit(1L).as("rk"), (col("id") * 5).as("rt"))
    time("as-of HOT KEY plain (one partition serializes)") {
      AsOfJoin.asOf(hotLeft, hotRight, "k", "rk", "t", "rt",
        Seq("ver"), Seq("ver")).count()
    }
    time("as-of HOT KEY bucketed (100 buckets)") {
      AsOfJoin.asOfBucketed(hotLeft, hotRight, "k", "rk", "t", "rt",
        Seq("ver"), Seq("ver"), bucketSeconds = 10000L).count()
    }

    // --- MaxSim: exact vs candidate/refine serving ---
    val mv = Tables.embeddings(spark, sf)
      .select(floor(col("vec_id") / 5).cast("long").as("gid"),
        col("vec_id").as("qt"), col("embedding").as("vec")).cache()
    println("SCALE token vectors: " + mv.count())
    val corpus = mv.select(col("gid"), col("vec"))
    val queries = mv.filter(col("gid") < 10)
      .select(col("gid").as("qid"), col("qt"), col("vec").as("qvec"))
    time("MaxSim EXACT top-10, 10 query bags") {
      MaxSim.topK(corpus, queries, 10).count()
    }
    time("MaxSim REFINED (candPerTok=64) top-10, 10 query bags") {
      MaxSim.topKRefined(corpus, queries, 10, 64).count()
    }

    spark.stop()
  }
}
