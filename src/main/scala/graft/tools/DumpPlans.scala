package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for a set of declared queries to files —
  * the optimization-round evidence trail (plans/r14/<query>_<tag>.txt).
  *
  * Usage: DumpPlans <sfDir> <outDir> <tag> [q1,q2,...]
  * Default query set = the union of every bench group (the timed surface).
  * Lifecycle queries execute their builds during DataFrame construction;
  * the dumped plan is the final served frame's — stated in each file header.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <sfDir> <outDir> <tag> [q1,q2,...]")
    val (sfDir, outDir, tag) = (args(0), args(1), args(2))
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").toSeq
      else (graft.SparkEntry.benchQueries ++ graft.SparkEntry.benchCurationQueries ++
        graft.SparkEntry.benchAssetQueries ++ graft.SparkEntry.benchServingQueries ++
        graft.SparkEntry.benchModelQueries ++ graft.SparkEntry.benchLayoutQueries ++
        graft.SparkEntry.benchStoreQueries ++ graft.SparkEntry.benchLifecycleQueries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"),
          s"== $name ($tag) sf=$sfDir cpus=$cpus ==\n" + plan)
        System.err.println(f"[plans] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
