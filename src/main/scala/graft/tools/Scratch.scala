package graft.tools

/** Disposable driver (not part of the library surface): smoke-runs the
  * driver contract (t1 gate) + edge probes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    import spark.implicits._
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n (driver checks > 0)")
    // probe: invalid metric rejected at construction
    try { graft.ann.AnnForest(metric = "manhattan"); println("PROBE metric: NO ERROR (bad)") }
    catch { case e: IllegalArgumentException => println("PROBE metric error: " + e.getMessage) }
    // probe: zero vector under cosine metric does not crash fit/search
    val df = Seq((0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f)), (4L, Array(2f, 0f))).toDF("vec_id", "embedding")
    val m = graft.ann.AnnForest(numTrees = 4, maxLeafSize = 2, metric = "cosine")
      .fit(df, "vec_id", "embedding")
    val res = m.search(Array(1f, 0f), 3)
    println("PROBE zero-vec cosine search: " + res.map(_._1).mkString(","))
    spark.stop()
  }
}
