package graft.tools

import org.apache.spark.sql.functions._

/** One-shot BIG-SHARD NSW routing ledger (round-10 verdict #4): at the
  * probed fixture sizes (63–250 nodes/shard) a flat walk from entry 0
  * is nearly free; this probe builds a single ≥50k-node shard of
  * deterministic synthetic vectors and measures what multi-entry
  * seeding buys at production shard sizes — recall vs the exact oracle,
  * nodes VISITED per query (= distance evaluations, via the
  * NswGraph.visitedCount instrumentation), and serve wall — at equal
  * ef, for numEntries ∈ {1, 4, 16}. The lifecycle invariants are
  * untouched by construction (seeding is search-time only; build
  * adjacency is identical — NswStoreSpec/NswGraphSpec pin that).
  */
object ProbeNswBig {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val n = sys.env.getOrElse("PROBE_NSW_N", "50000").toInt
    val dim = 16
    // deterministic synthetic corpus with CLUSTER structure (256
    // centers + small per-point jitter, all exact-integer hash
    // arithmetic): uniform random high-dim data is the degenerate
    // worst case for ANY graph ANN (distance concentration — true
    // neighbors barely closer than random points, measured here at
    // recall 0.20 flat across ef); real embeddings live on clustered
    // manifolds, which is the regime the backend serves
    def h(seed: Long, a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      pmod(pmod(a * lit(2654435761L) + b * lit(40503L) + lit(seed),
        lit(2147483647L)) * lit(2246822519L), lit(2147483647L))
        .cast("double") / lit(1073741823.5) - lit(1.0)
    val corpus = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), d =>
          (h(1L, pmod(col("id"), lit(256)), d)
            + h(2L, col("id"), d) * lit(0.15)).cast("float"))
          .as("embedding"))
      .localCheckpoint()
    val queries = corpus.filter(col("vec_id") % 251 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val nq = queries.count()
    println(s"corpus=$n dim=$dim queries=$nq single shard")
    val t0 = System.nanoTime()
    val truth = graft.operators.KnnExact.knnBatch(corpus, queries, 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"exact batch: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (hier <- Seq(false, true)) {
      val b0 = System.nanoTime()
      val model = graft.ann.NswGraph(m = 12, efConstruction = 64,
        numShards = 1, seed = 42L, hierarchy = hier)
        .fit(corpus, "vec_id", "embedding")
      model.graph.count()
      println(f"build (1 shard, $n nodes, hier=$hier): " +
        f"${(System.nanoTime() - b0) / 1e9}%.1f s")
      for (ef <- Seq(32, 64, 128); ne <- Seq(1, 4, 16)) {
        // min-of-2 serve wall; visited counted on the LAST run only
        // (the counter is a JVM-global LongAdder)
        var pairs = Set.empty[(Long, Long)]
        val times = Seq.fill(2) {
          graft.ann.NswGraph.visitedCount.reset()
          val s0 = System.nanoTime()
          pairs = model.knnJoin(queries, topK = 10, ef = ef, numEntries = ne)
            .select(col("query_id"), col("neighbor_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          (System.nanoTime() - s0) / 1e9
        }
        val visited = graft.ann.NswGraph.visitedCount.sum() / math.max(nq, 1)
        val recall = (pairs & truth).size.toDouble / truth.size
        println(f"hier=$hier ef=$ef%3d entries=$ne%2d recall=$recall%.3f " +
          f"visited/query=$visited%6d serve=${times.min}%5.2f s")
      }
    }
    // the SHARDED picture at 8× the corpus: 400k rows over 8 shards
    // (~50k/shard — the per-shard regime probed above), hierarchy on;
    // per-shard builds run in parallel inside one mapPartitions pass,
    // a serve broadcasts the query batch to all 8 beams and the global
    // top-k merges the union
    val big = spark.range(8L * n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), d =>
          (h(1L, pmod(col("id"), lit(1024)), d)
            + h(2L, col("id"), d) * lit(0.15)).cast("float"))
          .as("embedding"))
      .localCheckpoint()
    val bigQ = big.filter(col("vec_id") % 2003 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val bigTruth = graft.operators.KnnExact.knnBatch(big, bigQ, 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bb0 = System.nanoTime()
    val bigModel = graft.ann.NswGraph(m = 12, efConstruction = 64,
      numShards = 8, seed = 42L, hierarchy = true)
      .fit(big, "vec_id", "embedding")
    bigModel.graph.count()
    println(f"sharded build (8 shards x ~${n} nodes, hier): " +
      f"${(System.nanoTime() - bb0) / 1e9}%.1f s")
    for (ef <- Seq(32, 64)) {
      val times = Seq.fill(2) {
        val s0 = System.nanoTime()
        val p = bigModel.knnJoin(bigQ, topK = 10, ef = ef)
          .select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        ((System.nanoTime() - s0) / 1e9, p)
      }
      val (ts, p) = times.minBy(_._1)
      println(f"sharded 400k hier ef=$ef%3d " +
        f"recall=${(p & bigTruth).size.toDouble / bigTruth.size}%.3f serve=$ts%5.2f s")
    }
    spark.stop()
  }
}
