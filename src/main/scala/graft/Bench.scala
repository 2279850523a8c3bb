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
    def minOf3(names: Seq[String]): Map[String, Double] = names.map { name =>
      val runs = Seq.fill(3)(timeOnce(name))
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }.toMap
    // One sweep = headline group + curation group, with the steal-tick
    // delta measured across exactly the timed window.
    def sweep(): (Map[String, Double], Map[String, Double], Long) = {
      val s0 = stealTicks()
      val head = minOf3(SparkEntry.benchQueries)
      val cur = minOf3(SparkEntry.benchCurationQueries)
      val s1 = stealTicks()
      (head, cur, if (s0 < 0 || s1 < 0) -1L else s1 - s0)
    }
    // Contention GATE (round-8 item #2): rounds 6 and 7 both committed
    // recordings contaminated by hypervisor steal (12.8s vs a 7.6s
    // quiet-host truth) — min-of-3 can't save a sweep when the load
    // spans all three runs. Self-annotation (round 7) made the artifact
    // self-identifying; this makes it QUIET BY CONSTRUCTION: if more
    // than `gate` steal ticks landed inside the timed window, the whole
    // sweep reruns (up to 3 attempts), and the quietest attempt is the
    // one reported either way. 1 tick = 10 ms of one stolen CPU; ~50
    // ticks across a ~10 s sweep is the noise floor observed on this
    // host's quiet recordings (11-13 ticks).
    val gate = sys.env.getOrElse("SPARK_GRAFT_STEAL_GATE", "50").toLong
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPTS", "3").toInt
    var attempts = List.empty[(Map[String, Double], Map[String, Double], Long)]
    var done = false
    while (!done) {
      val a = sweep()
      attempts ::= a
      done = a._3 < 0 || a._3 <= gate || attempts.length >= maxAttempts
      if (!done)
        System.err.println(s"[bench] attempt ${attempts.length} contaminated " +
          s"(steal_ticks=${a._3} > $gate) — rerunning the sweep")
    }
    val (results, curation, stealDelta) =
      attempts.minBy { case (_, _, s) => if (s < 0) Long.MaxValue else s }
    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val curTotal = curation.values.filter(_ >= 0).sum
    // Contention annotation (kept alongside the gate): the 1-minute
    // load average sampled AFTER the timed runs, i.e. during them, and
    // the steal-tick delta across the reported sweep — a recording
    // that somehow still slipped through stays self-identifying.
    val loadAvg =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"curation_total":$curTotal,"curation_queries":${fmt(curation)},"sf":"$sfDir","load_avg_1m":$loadAvg,"steal_ticks":$stealDelta,"steal_gate":$gate,"sweep_attempts":${attempts.length}}""")
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
}
