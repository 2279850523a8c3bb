package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for the round-5 curation operators (same synthetic
  * corpora as [[ScaleProbe]]: 200k × 64 vectors, 100k 50-token docs):
  * unigram-LM scoring, duplicated-span metrics, BM25, random
  * projection (alone and as an ANN pre-step), SemDeDup.
  * Run: sbt "runMain graft.tools.ScaleProbeR5" */
object ScaleProbeR5 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val words = (0 until 500).map(i => s"w$i")
    val docs = spark.range(100000).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => element_at(
          array(words.map(lit): _*),
          (pmod(xxhash64(col("id") * 100 + i), lit(500)) + 1).cast("int")))).as("text"))
      .repartition(64).cache()
    println("SCALE docs: " + docs.count())

    time("unigram LM score (100k docs, self-trained)") {
      graft.operators.UnigramLm.score(docs).count()
    }
    time("dup-span stats (100k docs, 3-gram)") {
      graft.operators.TextDedup.dupShingleStats(docs, "doc_id", "text", 3).count()
    }
    val terms = docs.filter(col("doc_id") === 0)
      .select(explode(slice(graft.operators.TextAnalysis.tokens(col("text")), 1, 5)).as("term"))
    time("BM25 ad-hoc (100k docs, 5-term query)") {
      graft.operators.Bm25.score(docs, terms).count()
    }
    val qTerms = terms.collect().map(_.getString(0)).toSeq
    time("BM25 buildIndex (100k docs, 32 buckets — one-time)") {
      graft.operators.Bm25.buildIndex(docs, "graft_probe_bm25", 32)
    }
    time("BM25 scoreIndexed x5 (bucket-pruned serving)") {
      (1 to 5).foreach(_ =>
        graft.operators.Bm25.scoreIndexed(spark, "graft_probe_bm25", qTerms).count())
    }
    Seq("postings", "terms", "doclens", "stats", "tombstones").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_probe_bm25_$t"))

    val vecs = spark.range(200000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 1000.0).cast("float")).as("embedding"))
      .repartition(64).cache()
    println("SCALE vectors: " + vecs.count())

    val projected = time("random projection 200k x 64 -> 16") {
      val p = vecs.select(col("vec_id"),
        graft.functions.RandomProjection.project(col("embedding"), 64, 16)
          .cast("array<float>").as("embedding"))
        .cache()
      p.count()
      p
    }
    // the compose story: projection as the pre-step that shrinks every
    // downstream kernel/shuffle — IVF on 16 dims vs the 64-dim baseline
    val queries16 = projected.filter(col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    time("IVF fit+join on projected 16-dim (2k queries)") {
      graft.ann.IvfIndex(64, 8).fit(projected)
        .knnJoin(projected, queries16, 10).count()
    }
    val queries64 = vecs.filter(col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    time("IVF fit+join on raw 64-dim (2k queries, baseline)") {
      graft.ann.IvfIndex(64, 8).fit(vecs)
        .knnJoin(vecs, queries64, 10).count()
    }

    time("SemDeDup survivors (200k vectors, nlist 128, tau 0.9)") {
      graft.operators.SemanticDedup.survivors(
        vecs, "vec_id", "embedding", threshold = 0.9, nlist = 128).count()
    }
    spark.stop()
  }
}
