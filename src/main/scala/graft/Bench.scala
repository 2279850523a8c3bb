package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first timed query doesn't pay init costs.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // A failed query must not masquerade as a fast one: record -1 and
    // keep it out of the total so the baseline comparison stays honest.
    // Each query runs three times, reporting the min — first-run JIT/IO
    // noise and transient host contention (observed 5-25× wall-time
    // swings on a loaded host) otherwise dominate round-to-round
    // comparisons; min-of-3 is the steady-state estimate.
    def timeOnce(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      }
    }
    val results = SparkEntry.benchQueries.map { name =>
      val runs = Seq.fill(3)(timeOnce(name))
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Contention annotation: round 6's recorded bench was 1.5× the
    // quiet-host truth because a loaded box spanned all three runs and
    // min-of-3 couldn't save it. The 1-minute load average (sampled
    // AFTER the timed runs, i.e. during them) makes a contaminated
    // recording self-identifying instead of silently poisoning
    // round-over-round comparisons.
    val loadAvg =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    // Hypervisor steal is the sharper signal on a virtualized host:
    // load_avg includes the bench's OWN threads, but steal ticks are
    // cycles the hypervisor withheld — observed to hit the heavy
    // all-core queries (q30/q35/q37) 5-10× while light queries held
    // steady, rotating victims between runs. steal_ticks here is the
    // /proc/stat delta across the whole timed window (1 tick = 10 ms
    // of one stolen CPU); thousands of ticks = contaminated recording.
    val stealEnd = stealTicks()
    val stealDelta =
      if (stealStart < 0 || stealEnd < 0) -1L else stealEnd - stealStart
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load_avg_1m":$loadAvg,"steal_ticks":$stealDelta}""")
    spark.stop()
  }

  /** Aggregate steal-time ticks from /proc/stat (field 8 of the `cpu`
    * line); -1 when unreadable (non-Linux). */
  private def stealTicks(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else -1L
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1L }

  private val stealStart: Long = stealTicks()
}
