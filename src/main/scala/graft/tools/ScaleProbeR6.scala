package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for the round-5 serving additions (same synthetic corpus
  * as [[ScaleProbe]]: 200k × 64 vectors): attribute-filtered kNN,
  * radius joins, and standing-index delete/compact overheads.
  * Run: sbt "runMain graft.tools.ScaleProbeR6" */
object ScaleProbeR6 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // 200k × 64 with a 10-way label column (the filtered-kNN attribute)
    val vecs = spark.range(200000).select(
      col("id").as("vec_id"),
      pmod(xxhash64(col("id"), lit(7)), lit(10)).cast("int").as("label"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 1000.0).cast("float")).as("embedding"))
      .repartition(64).cache()
    println("SCALE vectors: " + vecs.count())
    val queries = vecs.filter(col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    val model = time("forest fit (collected build)") {
      graft.ann.AnnForest(numTrees = 20, maxLeafSize = 10, seed = 42L)
        .fit(vecs, "vec_id", "embedding")
    }
    time("bucketed kNN 2k queries, UNfiltered (baseline)") {
      model.knnJoinBucketed(vecs, queries, topK = 10).count()
    }
    time("bucketed kNN 2k queries, label=3 (10% selectivity)") {
      model.knnJoinBucketed(vecs, queries, topK = 10,
        corpusFilter = Some(col("label") === 3)).count()
    }
    // radius threshold near the synthetic corpus's close-pair tail
    time("bucketed radius join 2k queries") {
      model.radiusJoinBucketed(vecs, queries, maxDist = 2.0).count()
    }
    time("exact radius join 2k queries (oracle path, O(n·q))") {
      graft.operators.KnnExact.radiusJoin(vecs, queries, maxDist = 2.0).count()
    }

    val dModel = time("distributed fit (depth 12)") {
      graft.ann.DistributedAnnForest(numTrees = 20, maxLeafSize = 10,
        maxDepth = 12, seed = 42L).fit(vecs, "vec_id", "embedding")
    }
    // pin the routed table once: serve-vs-delete comparisons below
    // should measure the anti-join, not re-routing
    val pinned = dModel.compact()
    time("standing kNN 2k queries (compacted baseline)") {
      pinned.knnJoin(queries, topK = 10).count()
    }
    time("standing kNN 2k queries, query spill eps=0.25") {
      pinned.knnJoin(queries, topK = 10, querySpillEps = 0.25).count()
    }
    val deletes = vecs.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id")) // 1% of the corpus
    val removed = pinned.remove(deletes)
    time("standing kNN 2k queries, 1% tombstoned (lazy anti-join)") {
      removed.knnJoin(queries, topK = 10).count()
    }
    val compacted = time("compact() after delete (materialize)") {
      val c = removed.compact()
      c.corpusBuckets.count()
      c
    }
    time("standing kNN 2k queries, post-compaction") {
      compacted.knnJoin(queries, topK = 10).count()
    }

    // standing COMPRESSED corpus: encoded cell-assigned table bucketed
    // on cell; serving joins it with zero corpus-side exchange
    val pq = time("PQ fit (m=8)") {
      graft.ann.PqIndex(m = 8, seed = 42L).fit(vecs)
    }
    val ivf = graft.ann.IvfIndex(nlist = 64, nprobe = 8, seed = 42L).fit(vecs)
    time("saveCorpusIvf 200k (one-time bucket write)") {
      pq.saveCorpusIvf(ivf, vecs, "graft_probe_pqcorpus", buckets = 32)
    }
    time("indexed IVF-PQ serve 2k queries") {
      pq.knnJoinIvfIndexed(spark, ivf, "graft_probe_pqcorpus", queries, topK = 10).count()
    }
    time("ad-hoc IVF-PQ join 2k queries (comparison)") {
      pq.knnJoinIvf(ivf, vecs, queries, topK = 10).count()
    }
    spark.sql("DROP TABLE IF EXISTS graft_probe_pqcorpus")
    spark.stop()
  }
}
