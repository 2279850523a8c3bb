package graft.tools

import org.apache.spark.sql.functions._

/** Disposable driver (not part of the library surface) — exercises the
  * README's sample code verbatim through the public exports. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    import spark.implicits._
    import graft.api.GraftVectors

    // README sample, as a user would write it
    val vecs = GraftVectors.readVec(spark, "/root/reference/data/test.vec", dim = 300)
    val clean = GraftVectors.dedup(vecs)
    val model = GraftVectors.buildIndex(clean, numTrees = 10)
    val queries = clean.filter(_.word == "the")
    val nn = GraftVectors.search(model, queries, topK = 5)
    println("FACADE neighbors of 'the':")
    nn.join(clean.toDF().select($"id".as("neighbor_id"), $"word"), Seq("neighbor_id"))
      .orderBy("rank").select("rank", "word", "dist").collect()
      .foreach(r => println(f"FACADE   ${r.getInt(0)} ${r.getString(1)}%-10s ${r.getDouble(2)}%.4f"))

    // skew join probe: 1-bucket salt degenerates to a plain join
    val large = (0 until 100).map(i => (7L, i)).toDF("k", "payload")
    val small = Seq((7L, "x")).toDF("k", "attr")
    val one = graft.operators.SkewJoin.saltedInnerJoin(large, small, "k", saltBuckets = 1)
    println("SKEW 1-bucket count=" + one.count() + " (expect 100)")
    spark.stop()
  }
}
