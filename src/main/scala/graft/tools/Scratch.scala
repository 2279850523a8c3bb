package graft.tools

import org.apache.spark.sql.SparkSession

/** Disposable driver (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    // probe: the SparkSessionExtensions registration path (config-driven,
    // the way a cluster user would enable the operator)
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions"), 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 11L, (i * 7919 % 1000).toDouble)).toDF("key", "score")
    // build the plan WITHOUT TopKPerKey.install (extensions must supply the strategy)
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    val plan = graft.plans.TopKPerKeyPlan(
      Seq(GraftBridge.expression(df("key"))),
      Seq(SortOrder(GraftBridge.expression(df("score")), Ascending)),
      3, df.queryExecution.analyzed)
    val out = GraftBridge.ofRows(spark, plan)
    val n = out.count()
    println(s"EXTPROBE rows=$n (expect 33) strategies=" +
      spark.sessionState.planner.strategies.exists(_.toString.contains("TopKPerKey")))
    spark.stop()
  }
}
