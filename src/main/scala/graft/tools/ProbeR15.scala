package graft.tools

import org.apache.spark.sql.functions._

/** One-shot COUNT-STORE lifecycle probe: quantify the "merges are
  * MODEL-sized, not corpus-sized" claim behind NbStore/LmStore — init
  * a store from a large corpus, then append/remove small deltas and
  * compare walls. The delta merge pays (a) counting the delta
  * (delta-sized) and (b) rewriting the model tables (vocab-bounded) —
  * NEITHER grows with the standing corpus, so append wall should be
  * roughly flat as the init corpus grows 10×, while init wall tracks
  * the corpus. Same hash-synthesized corpus as ProbeR13/R14. */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    def synth(n: Long, off: Long = 0L) = spark.range(n)
      .select((col("id") + off).as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), (pmod((col("id") + off) * lit(2654435761L),
            lit(2147483647L)) % 46 + 5).cast("int")),
          i => concat(lit("w"), pmod((col("id") + off) * i * lit(40503L),
            lit(997)))))
          .as("text"),
        concat(lit("src"), pmod(col("id") + off, lit(4))).as("label"))
      .localCheckpoint()
    for (n <- Seq(1000000L, 10000000L)) {
      val corpus = synth(n)
      val delta = synth(10000L, off = n)
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"n=$n%8d $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      }
      val name = s"probe_r15_nb_$n"
      time("nb init") {
        graft.operators.NbStore.initStore(corpus, name)
      }
      time("nb append 10k") {
        graft.operators.NbStore.appendDocs(delta, name)
      }
      time("nb remove 10k") {
        graft.operators.NbStore.removeDocs(delta, name)
      }
      val lm = s"probe_r15_lm_$n"
      time("lm init") {
        graft.operators.LmStore.initStore(corpus, lm)
      }
      time("lm append 10k") {
        graft.operators.LmStore.appendDocs(delta, lm)
      }
      println(f"n=$n%8d model rows: nb_counts=" +
        spark.table(s"${name}_counts").count() +
        " lm_tri=" + spark.table(s"${lm}_tri").count())
      corpus.unpersist(); delta.unpersist()
    }
    spark.stop()
  }
}
