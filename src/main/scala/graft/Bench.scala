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
    // delta measured across exactly the timed window and the 1-minute
    // load average sampled at sweep START (the external-contention
    // signal, before our own run inflates it) and at sweep end.
    final case class Sweep(head: Map[String, Double], cur: Map[String, Double],
        asset: Map[String, Double], serving: Map[String, Double],
        model: Map[String, Double], layout: Map[String, Double],
        stores: Map[String, Double], lifecycle: Map[String, Double],
        steal: Long, loadPre: Double, loadPost: Double)
    def sweep(): Sweep = {
      val l0 = loadAvg1m()
      val s0 = stealTicks()
      val head = minOf3(SparkEntry.benchQueries)
      val cur = minOf3(SparkEntry.benchCurationQueries)
      val asset = minOf3(SparkEntry.benchAssetQueries)
      val serving = minOf3(SparkEntry.benchServingQueries)
      val model = minOf3(SparkEntry.benchModelQueries)
      val layout = minOf3(SparkEntry.benchLayoutQueries)
      val stores = minOf3(SparkEntry.benchStoreQueries)
      // build-dominated lifecycle entries, split from the serve groups
      // (r13 verdict #6) so each total reads unambiguously
      val lifecycle = minOf3(SparkEntry.benchLifecycleQueries)
      val s1 = stealTicks()
      Sweep(head, cur, asset, serving, model, layout, stores, lifecycle,
        if (s0 < 0 || s1 < 0) -1L else s1 - s0, l0, loadAvg1m())
    }
    // Contention GATES: rounds 6 and 7 committed recordings contaminated
    // by hypervisor steal (12.8s vs a 7.6s quiet-host truth); round 8's
    // steal gate closed that channel but its artifact was still recorded
    // under same-host LOAD (load_avg 3.88, 8.41s vs the 5.7-6.6s steady
    // state) — /proc/stat steal can't see a busy neighbor process on the
    // same host. So two gates, both rerun-the-sweep (up to 3 attempts,
    // quietest attempt reported either way): steal ticks inside the
    // timed window ≤ `gate` (1 tick = 10 ms of one stolen CPU; quiet
    // floor here is 8-13 ticks) AND pre-sweep load_avg_1m ≤ `loadGate`
    // (sampled BEFORE the sweep so our own threads don't trip it; a
    // load-contaminated attempt sleeps 20s first so the 1-minute
    // average can actually decay before the retry).
    val gate = sys.env.getOrElse("SPARK_GRAFT_STEAL_GATE", "50").toLong
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "1.0").toDouble
    // Retry-with-BACKOFF (round-10 verdict #5): rounds 8 and 9 both
    // committed artifacts recorded under external steal because three
    // back-to-back attempts all landed inside the same contention
    // window — back-to-back retries sample the SAME weather. Attempts
    // now grow (default 6) and every contaminated attempt sleeps a
    // linearly growing backoff first (30s, 60s, 90s, …; load keeps
    // its extra decay wait), so a minutes-long neighbor burst is
    // OUTWAITED instead of re-measured. The quietest attempt is still
    // reported (and self-identifies) if the host never calms.
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPTS", "6").toInt
    val backoffMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BACKOFF_MS", "30000").toLong
    var attempts = List.empty[Sweep]
    var done = false
    while (!done) {
      val a = sweep()
      attempts ::= a
      val stealBad = a.steal >= 0 && a.steal > gate
      val loadBad = a.loadPre >= 0 && a.loadPre > loadGate
      done = (!stealBad && !loadBad) || attempts.length >= maxAttempts
      if (!done) {
        val wait = backoffMs * attempts.length
        System.err.println(s"[bench] attempt ${attempts.length} contaminated " +
          s"(steal_ticks=${a.steal} gate=$gate, load_pre=${a.loadPre} " +
          s"gate=$loadGate) — backing off ${wait / 1000}s, then rerunning")
        Thread.sleep(wait + (if (loadBad) 20000 else 0))
      }
    }
    // Prefer the best GATE-CLEAN attempt outright (r12 verdict #5:
    // BENCH_r12 was committed with steal 1870 vs its own gate of 50 —
    // the first artifact to fail its own meter); only when NO attempt
    // ever passed both gates does the quietest dirty one get reported,
    // and the stamp below marks it unusable for round-over-round diffs.
    def clean(a: Sweep): Boolean =
      !(a.steal >= 0 && a.steal > gate) &&
        !(a.loadPre >= 0 && a.loadPre > loadGate)
    val best = attempts.minBy { a =>
      (!clean(a),
        if (a.steal < 0) Long.MaxValue else a.steal,
        if (a.loadPre < 0) Double.MaxValue else a.loadPre)
    }
    val gateClean = clean(best)
    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = best.head.values.filter(_ >= 0).sum
    val curTotal = best.cur.values.filter(_ >= 0).sum
    val assetTotal = best.asset.values.filter(_ >= 0).sum
    val servingTotal = best.serving.values.filter(_ >= 0).sum
    val modelTotal = best.model.values.filter(_ >= 0).sum
    val layoutTotal = best.layout.values.filter(_ >= 0).sum
    val storesTotal = best.stores.values.filter(_ >= 0).sum
    val lifecycleTotal = best.lifecycle.values.filter(_ >= 0).sum
    // Both load samples stay in the artifact so a recording that
    // somehow slips both gates is still self-identifying.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(best.head)},"curation_total":$curTotal,"curation_queries":${fmt(best.cur)},"asset_total":$assetTotal,"asset_queries":${fmt(best.asset)},"serving_total":$servingTotal,"serving_queries":${fmt(best.serving)},"model_total":$modelTotal,"model_queries":${fmt(best.model)},"layout_total":$layoutTotal,"layout_queries":${fmt(best.layout)},"stores_total":$storesTotal,"stores_queries":${fmt(best.stores)},"lifecycle_total":$lifecycleTotal,"lifecycle_queries":${fmt(best.lifecycle)},"sf":"$sfDir","load_avg_1m":${best.loadPost},"load_avg_pre":${best.loadPre},"load_gate":$loadGate,"steal_ticks":${best.steal},"steal_gate":$gate,"sweep_attempts":${attempts.length},"gate_clean":$gateClean}""")
    spark.stop()
  }

  /** 1-minute load average from /proc/loadavg; -1 when unreadable. */
  private def loadAvg1m(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1.0 }

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
