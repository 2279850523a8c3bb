package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** ProbeR17 extension (round-11 verdict #5): the 3-D blind-spot-box
  * comparison — entity × time × shard laid out by natural time order,
  * 3-D Morton (`zvalue3`, q235) and 3-D Hilbert (`hilbertIndex3`,
  * q244, the Skilling kernel), read back through 3-D box queries.
  * Metric per box: files whose per-file (min,max) stats box
  * intersects the query box in ALL THREE dimensions — exactly the
  * row-group skip decision a parquet reader makes from column-chunk
  * statistics, measured engine-independently (the 2-D
  * ZOrder.filesTouched geometry, third dimension added), plus the
  * measured filtered-count wall.
  * Run: sbt "runMain graft.tools.ProbeR17X3D". */
object ProbeR17X3D {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val n = 10000000L
    val (tMin, tMax) = (1704067200L, 1735689599L)
    val df = spark.range(n).selectExpr(
      "id",
      "CAST((id * 2654435761) % 10000 AS LONG) AS user_id",
      s"CAST($tMin + (id * 40503) % 31622400 AS LONG) AS sec",
      "CAST((id * 40503) % 1024 AS LONG) AS shard")
    val base = "/tmp/graft_probe_r17x3d"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, wLin) = timed {
      df.repartitionByRange(128, col("sec")).sortWithinPartitions("sec")
        .write.mode("overwrite").parquet(s"$base/linear")
    }
    val (_, wZ) = timed {
      ZOrder.layout(df, ZOrder.zvalue3(
          col("user_id"), 0L, 9999L, col("sec"), tMin, tMax,
          col("shard"), 0L, 1023L, bits = 10), 128)
        .write.mode("overwrite").parquet(s"$base/z3")
    }
    val (_, wH) = timed {
      ZOrder.layout(df, ZOrder.hilbertIndex3(
          ZOrder.bucket(col("user_id"), 0L, 9999L, 10),
          ZOrder.bucket(col("sec"), tMin, tMax, 10),
          ZOrder.bucket(col("shard"), 0L, 1023L, 10), bits = 10), 128)
        .write.mode("overwrite").parquet(s"$base/h3")
    }
    println(f"PROBE_R17X3D write: linear $wLin%.1f s, zorder3 $wZ%.1f s, hilbert3 $wH%.1f s (10M rows, 128 files)")

    def filesTouched3(dir: String, uLo: Long, uHi: Long,
        sLo: Long, sHi: Long, hLo: Long, hHi: Long): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
          min(col("sec")).as("s0"), max(col("sec")).as("s1"),
          min(col("shard")).as("h0"), max(col("shard")).as("h1"))
      val total = stats.count()
      val touched = stats.filter(
        col("u1") >= uLo && col("u0") <= uHi &&
        col("s1") >= sLo && col("s0") <= sHi &&
        col("h1") >= hLo && col("h0") <= hHi).count()
      (touched, total)
    }

    // ~1%-per-dim slices plus the partially-selective shapes
    val boxes = Seq(
      ("all-three", 5000L, 5099L, tMin + 15000000L, tMin + 15316224L, 500L, 515L),
      ("user+time", 5000L, 5099L, tMin + 15000000L, tMin + 15316224L, 0L, 1023L),
      ("shard-only", 0L, 9999L, tMin, tMax, 500L, 515L))
    for ((name, uLo, uHi, sLo, sHi, hLo, hHi) <- boxes) {
      for (layout <- Seq("linear", "z3", "h3")) {
        val dir = s"$base/$layout"
        val (touched, total) = filesTouched3(dir, uLo, uHi, sLo, sHi, hLo, hHi)
        val (cnt, t) = timed {
          spark.read.parquet(dir)
            .filter(col("user_id").between(uLo, uHi) &&
              col("sec").between(sLo, sHi) &&
              col("shard").between(hLo, hHi)).count()
        }
        println(f"PROBE_R17X3D $name%-11s $layout%-7s files $touched%3d/$total%3d  scan $t%6.2f s  ($cnt rows)")
      }
    }
    spark.stop()
  }
}
