package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap for the graft engine.
  *
  * Tuned for the harness's `local[32]` single-JVM mode, but every knob
  * here is the one you'd also set on a 1000-executor cluster:
  * shuffle partitions sized to parallelism (not the 200 default), AQE on
  * (runtime coalescing + skew-join splitting), and UTC so timestamp
  * semantics match the DuckDB oracle.
  */
object GraftSession {

  /** Apply graft's standard config to any builder. */
  def configure(b: SparkSession.Builder, cpus: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc runs. */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft"),
      cpus
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
