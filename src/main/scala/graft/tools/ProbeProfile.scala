package graft.tools

import org.apache.spark.sql.functions._

/** One-shot PROFILING probe: quantify the q240 claim — the exact
  * profile's Expand multiplies rows by profiled-column count into the
  * shuffle, so its cost grows with k; approxProfile aggregates all k
  * columns over unmultiplied rows, so k is (nearly) free. 10M rows,
  * k ∈ {2, 5, 10} mixed-type columns, wall per face.
  * Run: sbt "runMain graft.tools.ProbeProfile". */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val df = spark.range(10000000L).selectExpr(
      "id AS c1",
      "CAST(id % 1000003 AS LONG) AS c2",
      "concat('s', id % 500000) AS c3",
      "concat('t', (id * 2654435761) % 97) AS c4",
      "CAST(id % 7 AS INT) AS c5",
      "concat('u', (id * 40503) % 1000000) AS c6",
      "CAST((id * 31) % 86400 AS LONG) AS c7",
      "concat('v', id % 12) AS c8",
      "CAST(id % 2 AS INT) AS c9",
      "concat('w', (id * 7919) % 250000) AS c10")
      .localCheckpoint()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE_PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    for (k <- Seq(2, 5, 10)) {
      val cols = (1 to k).map(i => s"c$i")
      time(s"exact   k=$k") {
        graft.operators.Profile.profile(df, cols).collect()
      }
      time(s"approx  k=$k") {
        graft.operators.Profile.approxProfile(df, cols).collect()
      }
    }
    spark.stop()
  }
}
