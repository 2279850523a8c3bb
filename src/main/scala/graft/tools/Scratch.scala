package graft.tools

/** Disposable driver (not part of the library surface): smoke-runs the
  * driver contract exactly as the harness does (t1 gate). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n (driver checks > 0)")
    spark.stop()
  }
}
