package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB cost profile of one declared query (optimization round 14):
  * a SparkListener records every job's wall time and call site while the
  * query runs; the report names where a multi-job lifecycle query's
  * seconds actually go (guide §1 — measure before touching).
  *
  * Usage: ProbeJobs <sfDir> <queryName> [reps]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeJobs <sfDir> <queryName> [reps]")
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus)
    // warmup: JIT + parquet footer caches, matching Bench's warmup read
    spark.read.parquet(s"$sfDir/region.parquet").count()

    final case class Job(id: Int, t0: Long, var t1: Long = -1L,
        site: String = "", var stages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val j = Job(js.jobId, System.nanoTime(), site = site)
        j.stages = js.stageInfos.size
        jobs.put(js.jobId, j)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.t1 = System.nanoTime()
      }
    }
    (1 to reps).foreach { rep =>
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val tBuild = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tEnd = System.nanoTime()
      // let listener events drain
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val done = jobs.values.asScala.toSeq.sortBy(_.t0)
      val total = (tEnd - t0) / 1e9
      println(f"\n=== $name rep $rep: total ${total}%.2fs " +
        f"(construct ${(tBuild - t0) / 1e9}%.2fs, action ${(tEnd - tBuild) / 1e9}%.2fs), " +
        f"${done.size} jobs ===")
      // chronological with gaps: driver-side time BETWEEN jobs is where
      // planning/catalog work hides
      var prevEnd = t0
      done.foreach { j =>
        val gap = (j.t0 - prevEnd) / 1e9
        val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
        println(f"job ${j.id}%3d  gap ${gap}%6.3fs  dur ${dur}%6.3fs  " +
          f"stages ${j.stages}%2d  ${j.site}")
        if (j.t1 > 0) prevEnd = j.t1
      }
      val jobSum = done.collect { case j if j.t1 > 0 => (j.t1 - j.t0) / 1e9 }.sum
      println(f"job-time sum ${jobSum}%.2fs; driver gaps ${total - jobSum}%.2fs")
      // top sites
      println("--- by call site ---")
      done.groupBy(_.site).map { case (s, js) =>
        (s, js.size, js.collect { case j if j.t1 > 0 => (j.t1 - j.t0) / 1e9 }.sum)
      }.toSeq.sortBy(-_._3).take(25).foreach { case (s, n, t) =>
        println(f"${t}%7.3fs  n=$n%-3d  $s")
      }
    }
    spark.stop()
  }
}
