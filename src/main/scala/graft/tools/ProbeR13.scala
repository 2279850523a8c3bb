package graft.tools

import org.apache.spark.sql.functions._

/** One-shot DATALOADER-LAYER scale probe (round-10 verdict #9): the
  * curriculum cut, the source-interleaved curriculum and the epoch
  * schedule at ~10⁶ and ~10⁷ synthetic docs, certifying that
  *   - GlobalOrder's count-job + range-partitioned sort + zipWithIndex
  *     shape stays ~linear (n log n sort constant — the semantic floor
  *     of any global order),
  *   - the (phases × sources) offset table the interleave broadcasts
  *     stays driver-sized (16 rows here) at ANY corpus size,
  *   - no stage converges on one task (the zero-window claim holds at
  *     scale, not just in the PlanSpec string pin).
  * Texts are synthesized by exact hash arithmetic (word counts 5–50,
  * vocabulary ~1000), so difficulty varies realistically and the probe
  * is reproducible with no RNG state. */
object ProbeR13 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    def synth(n: Long) = spark.range(n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), (pmod(col("id") * lit(2654435761L), lit(2147483647L))
            % 46 + 5).cast("int")),
          i => concat(lit("w"), pmod(col("id") * i * lit(40503L), lit(997)))))
          .as("text"),
        concat(lit("src"), pmod(col("id"), lit(4))).as("source"))
      .localCheckpoint()
    for (n <- Seq(1000000L, 10000000L)) {
      val docs = synth(n)
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"n=$n%8d $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s  ($rows rows)")
      }
      time("curriculum phases") {
        graft.operators.Curriculum.phases(docs, numPhases = 4).count()
      }
      time("interleaved") {
        graft.operators.Curriculum.interleaved(docs, numPhases = 4).count()
      }
      time("epoch schedule x3") {
        graft.operators.EpochShuffle.schedule(docs, numEpochs = 3).count()
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
