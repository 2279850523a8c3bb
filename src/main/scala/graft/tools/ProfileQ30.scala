package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for q30 (minhash LSH pairs) at the bench SF. */
object ProfileQ30 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c")
    }
    val q = graft.SparkEntry.queries("q30_minhash_pairs")
    t("q30 run1")(q(spark, sfDir).count())
    t("q30 run2")(q(spark, sfDir).count())
    t("q30 run3")(q(spark, sfDir).count())
    spark.stop()
  }
}
