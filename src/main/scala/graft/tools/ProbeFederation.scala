package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{CountStore, HhStore, NbStore}

/** Measures the federation layer's scale claim: a store⊕store merge is
  * MODEL-sized work while a refit is CORPUS-sized — so as the corpus
  * grows, the merge wall should track the MODEL's growth (vocab,
  * sublinear in corpus) while the one-shot union fit tracks the
  * corpus. Two fixture scales (sf0.01 → sf0.1, 10× docs), two
  * families (NB model, HH store): per scale, time the two side fits,
  * the merge, and a one-shot fit of the union; print the model row
  * counts the merge actually touched. Findings land in ARCHITECTURE
  * "Measured (round 14)". */
object ProbeFederation {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(cpus = 8)
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-44s $s%7.2f s")
      s
    }

    // Fixture corpora (500 / 5k docs, vocab 155) sit entirely inside
    // the ~1 s Spark job floor — every op times the same (measured
    // first; the q252 fixed-cost lesson). The separation needs a
    // corpus where tokenize+shuffle dominates, so generate one:
    // n docs × 40 tokens from a 50k-token vocabulary — the MODEL stays
    // ~50k rows/group-key while the corpus grows 10×.
    for (nDocs <- Seq(50000, 500000)) {
      val tag = s"n$nDocs"
      println(s"=== synthetic $nDocs docs × 40 tokens, vocab 50k ===")
      val docs = graft.GraftSession.widen(
        spark.range(nDocs.toLong).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(40)),
            i => concat(lit("w"), pmod(col("id") * i * lit(2654435761L),
              lit(50000L))))).as("text"),
          concat(lit("l"), pmod(col("id"), lit(8))).as("label")))
        .localCheckpoint()
      def half(m: Int) = docs.filter(col("doc_id") % 2 === m)

      // NB model federation
      val nb = Seq("a", "b", "c", "f").map(s => s"pf_${tag}_nb_$s")
      for (n <- nb; t <- Seq("_counts", "_class", "_applied", "_layout")) {
        graft.sources.Sinks.dropTable(spark, n + t)
        CountStore.setBuilding(spark, n, on = false)
      }
      time(s"[$tag] NB fit side a (half corpus)") {
        NbStore.initStore(half(0), nb(0), buckets = 8)
      }
      time(s"[$tag] NB fit side b (half corpus)") {
        NbStore.initStore(half(1), nb(1), buckets = 8)
      }
      time(s"[$tag] NB mergeStores (model-sized)") {
        NbStore.mergeStores(spark, nb(0), nb(1), nb(2), buckets = 8)
      }
      time(s"[$tag] NB one-shot union fit (corpus-sized)") {
        NbStore.initStore(docs, nb(3), buckets = 8)
      }
      println(s"[$tag] NB model rows merged: " +
        spark.table(nb(2) + "_counts").count())

      // HH store federation (tokens per lang)
      val hh = Seq("a", "b", "c", "f").map(s => s"pf_${tag}_hh_$s")
      for (n <- hh; t <- Seq("_hh", "_hh_n", "_hh_params", "_applied",
          "_stale", "_layout")) {
        graft.sources.Sinks.dropTable(spark, n + t)
        CountStore.setBuilding(spark, n, on = false)
      }
      def toks(m: Int) = half(m).select(col("label").as("grp"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
      val allToks = docs.select(col("label").as("grp"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
      time(s"[$tag] HH fit side a") {
        HhStore.initStore(toks(0), hh(0), "grp", "item", k = 100000)
      }
      time(s"[$tag] HH fit side b") {
        HhStore.initStore(toks(1), hh(1), "grp", "item", k = 100000)
      }
      time(s"[$tag] HH mergeStores (summaries-sized)") {
        HhStore.mergeStores(spark, hh(0), hh(1), hh(2))
      }
      time(s"[$tag] HH one-shot union fit (corpus-sized)") {
        HhStore.initStore(allToks, hh(3), "grp", "item", k = 100000)
      }
      println(s"[$tag] HH counters merged: " +
        spark.table(hh(2) + "_hh").count())
    }
    spark.stop()
  }
}
