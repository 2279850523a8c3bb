package graft.tools

import org.apache.spark.sql.functions._

/** One-shot HEAVY-HITTERS store probe: quantify the "state is
  * GROUPS-sized, waves are batch+store-sized" claim behind HhStore —
  * feed a Zipf-ish synthetic token stream (the shape real n-gram
  * frequencies have) through init + waves at growing corpus sizes and
  * report (a) per-wave wall (should track the WAVE, not the history),
  * (b) store row count (≤ k × groups regardless of distinct items
  * seen), and (c) the realized worst undercount vs the n/(k+1)
  * theorem bound. Also measures the exact alternative's state for
  * contrast (distinct (grp, item) pairs — the number the exact form
  * must retain). */
object ProbeHH {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    // Zipf-ish: item id = floor(u^3 * V) concentrates mass on low ids
    def synth(n: Long, off: Long) = spark.range(n)
      .select(concat(lit("g"), pmod(col("id") + off, lit(64))).as("grp"),
        concat(lit("t"), floor(
          pow(pmod((col("id") + off) * lit(2654435761L), lit(2147483647L))
            .cast("double") / 2147483647.0, 3.0) * 100000).cast("long"))
          .as("item"))
      .localCheckpoint()
    val k = 100
    for (n <- Seq(1000000L, 10000000L)) {
      val name = s"probe_hh_$n"
      for (t <- Seq(s"${name}_hh", s"${name}_hh_n", s"${name}_hh_params",
          s"${name}_applied"))
        graft.sources.Sinks.dropTable(spark, t)
      graft.operators.CountStore.setBuilding(spark, name, on = false)
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"n=$n%9d $label%-16s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      }
      val waves = (0 until 4).map(w => synth(n / 4, off = w * (n / 4)))
      time("init (wave 0)") {
        graft.operators.HhStore.initStore(waves(0), name, "grp", "item", k)
      }
      for (w <- 1 until 4)
        time(s"wave $w") {
          graft.operators.HhStore.applyBatch(waves(w), name, "grp", "item", w)
        }
      val all = waves.reduce(_ unionByName _)
      val stateRows = spark.table(s"${name}_hh").count()
      val exactRows = all.select("grp", "item").distinct().count()
      // realized worst undercount vs the theorem bound
      val truth = all.groupBy("grp", "item").agg(count(lit(1)).as("t"))
      val gn = all.groupBy("grp").agg(count(lit(1)).as("gn"))
      val worst = spark.table(s"${name}_hh")
        .join(truth, Seq("grp", "item")).join(gn, Seq("grp"))
        .select(max(col("t") - col("cnt")).as("w"),
          max(floor(col("gn") / (k + 1))).as("b"))
        .head()
      println(f"n=$n%9d state=$stateRows rows (exact would be $exactRows); " +
        s"worst undercount ${worst.getLong(0)} vs bound ${worst.getLong(1)}")
      waves.foreach(_.unpersist())
    }
    spark.stop()
  }
}
