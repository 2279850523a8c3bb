package graft.tools

import org.apache.spark.sql.functions._

/** One-shot TEXT-MODEL-LAYER scale probe: trigram stupid-backoff LM
  * scoring, sliding-window chunking and the multiclass NB fit+serve
  * pipeline at ~10⁶ and ~10⁷ synthetic docs, certifying that
  *   - the LM's model tables stay Zipf-bounded (vocab is fixed at
  *     ~1000 words here, so the trigram table growth is sub-linear in
  *     the corpus and the five equi-joins stay shuffle-bounded),
  *   - chunking is a pure narrow map (wall tracks the explode output
  *     size, no shuffle stage at any n),
  *   - NB fit+serve is two count aggregations + one join (no stage
  *     converges on one task; the class table broadcast stays
  *     driver-sized at any corpus size).
  * Same reproducible hash-synthesized corpus as ProbeR13 (word counts
  * 5–50, vocabulary ~1000, 4 sources as class labels). 90/10 split by
  * the id hash, train-on-90 / serve-the-10 like q214/q217. */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    def synth(n: Long) = spark.range(n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), (pmod(col("id") * lit(2654435761L), lit(2147483647L))
            % 46 + 5).cast("int")),
          i => concat(lit("w"), pmod(col("id") * i * lit(40503L), lit(997)))))
          .as("text"),
        concat(lit("src"), pmod(col("id"), lit(4))).as("label"))
      .localCheckpoint()
    for (n <- Seq(1000000L, 10000000L)) {
      val docs = synth(n)
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L))
      val train = docs.filter(h % 100 < 90)
      val hold = docs.filter(h % 100 >= 90)
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"n=$n%8d $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s  ($rows rows)")
      }
      time("trigram backoff") {
        graft.operators.UnigramLm.trigramStupidBackoff(hold, train).count()
      }
      time("chunk w=64 s=48") {
        graft.operators.Chunking.chunk(docs).count()
      }
      time("nb fit+classify") {
        graft.operators.NbClassifier.classify(hold, train).count()
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
