package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** One-shot LAYOUT probe: parquet written along the Morton curve vs
  * the natural ingest order (sorted by time), read back through box
  * queries. Two metrics per query box:
  *   files   — files whose per-file (min,max) stats box intersects the
  *             query box, i.e. what any stats-aware reader must open
  *             (engine-independent geometry; ZOrder.filesTouched);
  *   scan s  — measured wall-clock of a filtered count over the
  *             layout (Spark's parquet reader skips row-groups via
  *             the same stats, so geometry should show up as time).
  * Synthetic uniform (user_id × second-of-year) grid, 10M rows, 128
  * files per layout: big enough that per-file stat boxes are tight,
  * deterministic so the numbers are re-runnable.
  * Run: sbt "runMain graft.tools.ProbeR17ZOrder". */
object ProbeR17ZOrder {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val n = 10000000L
    val (tMin, tMax) = (1704067200L, 1735689599L)
    val df = spark.range(n).selectExpr(
      "id",
      "CAST((id * 2654435761) % 10000 AS LONG) AS user_id",
      s"CAST($tMin + (id * 40503) % 31622400 AS LONG) AS sec")
    val base = "/tmp/graft_probe_r17"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, wLin) = timed {
      df.repartitionByRange(128, col("sec")).sortWithinPartitions("sec")
        .write.mode("overwrite").parquet(s"$base/linear")
    }
    val (_, wZ) = timed {
      ZOrder.layout(df, ZOrder.zvalue2(
          col("user_id"), 0L, 9999L, col("sec"), tMin, tMax, bits = 16), 128)
        .write.mode("overwrite").parquet(s"$base/z")
    }
    val (_, wH) = timed {
      val bucketed = df
        .withColumn("__bx", ZOrder.bucket(col("user_id"), 0L, 9999L, 16))
        .withColumn("__by", ZOrder.bucket(col("sec"), tMin, tMax, 16))
      ZOrder.withHilbert(bucketed, col("__bx"), col("__by"), 16, "__d")
        .repartitionByRange(128, col("__d")).sortWithinPartitions("__d")
        .drop("__bx", "__by", "__d")
        .write.mode("overwrite").parquet(s"$base/hilbert")
    }
    println(f"PROBE_R17 write: linear $wLin%.1f s, zorder $wZ%.1f s, hilbert $wH%.1f s (10M rows, 128 files)")

    // 1%-wide slices: both dims, user only, time only
    val boxes = Seq(
      ("both-selective", 5000L, 5099L, tMin + 15000000L, tMin + 15316224L),
      ("user-only", 5000L, 5099L, tMin, tMax),
      ("time-only", 0L, 9999L, tMin + 15000000L, tMin + 15316224L))
    for ((name, uLo, uHi, sLo, sHi) <- boxes) {
      for (layout <- Seq("linear", "z", "hilbert")) {
        val dir = s"$base/$layout"
        val (touched, total) = ZOrder.filesTouched(dir, spark,
          "user_id", uLo, uHi, "sec", sLo, sHi)
        val (cnt, t) = timed {
          spark.read.parquet(dir)
            .filter(col("user_id").between(uLo, uHi) &&
              col("sec").between(sLo, sHi)).count()
        }
        println(f"PROBE_R17 $name%-15s $layout%-7s files $touched%3d/$total%3d  scan $t%6.2f s  ($cnt rows)")
      }
    }
    spark.stop()
  }
}
