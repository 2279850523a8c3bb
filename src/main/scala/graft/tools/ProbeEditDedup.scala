package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One-shot cost ledger for the PassJoin edit near-dup (q203's
  * operator) at sf0.1: banded candidate count and wall time vs the
  * quadratic brute form — the "is the banding actually buying
  * sub-quadratic" evidence ARCHITECTURE.md quotes. */
object ProbeEditDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val jit = docs.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"),
        concat(substring($"text", 1, 2), lit("x"), substring($"text", 4, 7),
          lit("q"), substring($"text", 12, 1000000)).as("text"))
    val corpus = docs.unionByName(jit).localCheckpoint()
    val n = corpus.count()
    println(s"corpus=$n")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val banded = time("banded (PassJoin)") {
      graft.operators.TextDedup.editNearDupPairs(corpus, "doc_id", "text")
        .count()
    }
    val brute = time("brute all-pairs") {
      val p = corpus.select($"doc_id".as("id"),
        lower(substring($"text", 1, 60)).as("t"))
        .filter(length($"t") >= 3)
      p.as("a").join(p.as("b"),
          col("a.id") < col("b.id") &&
            abs(length(col("a.t")) - length(col("b.t"))) <= 2)
        .filter(levenshtein(col("a.t"), col("b.t")) <= 2)
        .count()
    }
    println(s"banded_pairs=$banded brute_pairs=$brute equal=${banded == brute}")
    spark.stop()
  }
}
