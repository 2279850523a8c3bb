package graft.tools

import org.apache.spark.sql.functions._

/** Disposable profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    // probe 1: wrong input type through the SQL surface
    try {
      spark.sql("SELECT sq_euc_dist(array('a','b'), array('c','d'))").collect()
      println("PROBE1: no error (unexpected)")
    } catch {
      case e: Exception => println("PROBE1 error: " + e.getMessage.linesIterator.next())
    }
    // probe 2: does the kernel live inside a codegen stage?
    val df = graft.SparkEntry.queries("q21_knn_exact_point")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("PROBE2 codegen stages: " + plan.linesIterator.count(_.contains("*(")))
    println("PROBE2 has sqeucdistance in plan: " + plan.toLowerCase.contains("sqeucdistance"))
    // probe 3: NULL input → NULL out (nullIntolerant), not a crash
    val r = spark.sql("SELECT sq_euc_dist(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))").head()
    println("PROBE3 null in -> " + (if (r.isNullAt(0)) "null out" else r.get(0)))
    spark.stop()
  }
}
