package graft.tools

import org.apache.spark.sql.functions._

/** Reproducible scale probe (ARCHITECTURE.md "Scale probe" section):
  * exercises the heavy operators at ~100× fixture scale with synthetic
  * data to surface shuffle/memory pathologies local fixtures can't.
  * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.ScaleProbe" */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // 200k vectors, dim 64 (100x the sf0.1 embeddings table)
    val vecs = spark.range(200000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 1000.0).cast("float")).as("embedding"))
      .repartition(64).cache()
    println("SCALE vectors: " + vecs.count())

    val model = time("forest fit (200k x 64, 50 trees)") {
      graft.ann.AnnForest(50, 5, 42L).fit(vecs, "vec_id", "embedding")
    }
    val queries = vecs.filter(col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val qvecs = queries.limit(100).collect().map(_.getSeq[Float](1).toArray)
    model.search(qvecs(0), 10) // materialize compact index + JIT warm
    val t0 = System.nanoTime()
    qvecs.foreach(q => model.search(q, 10))
    println(f"SCALE per-search driver-side: ${(System.nanoTime() - t0) / 1e6 / 100}%.2f ms")
    time("broadcast searchBatch (2k queries)") {
      model.searchBatch(queries, 10).count()
    }
    time("bucketed knnJoin (2k queries vs 200k corpus)") {
      model.knnJoinBucketed(vecs, queries, 10).count()
    }
    // Bulk self-join (reference Q4 full-corpus mode): two-sided routes
    // the corpus through the traversal UDF twice and shuffles both join
    // sides; the self-join path routes once and pair-generates in place.
    time("two-sided bucketed join, corpus as queries (200k x 200k)") {
      val asQ = vecs.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      model.knnJoinBucketed(vecs, asQ, 10).count()
    }
    time("knnSelfJoinBucketed (200k x 200k)") {
      model.knnSelfJoinBucketed(vecs, 10).count()
    }
    val ivf64 = time("IVF fit (nlist 64, nprobe 8)") {
      graft.ann.IvfIndex(64, 8).fit(vecs)
    }
    time("IVF join (2k queries)") {
      ivf64.knnJoin(vecs, queries, 10).count()
    }
    // PQ: the compressed path. Encode once (write-once at scale), then
    // the ADC join scans only (id, 8-byte code) — compare against the
    // bucketed join that reads raw 256-byte vectors.
    val pqModel = time("PQ fit (m=8, 64k training sample)") {
      graft.ann.PqIndex(m = 8, seed = 42L).fit(vecs)
    }
    val encoded = time("PQ encode 200k") {
      val e = pqModel.encode(vecs).select("vec_id", "pq_code").cache()
      e.count()
      e
    }
    time("PQ ADC knnJoin (2k queries vs 200k codes, shortlist 100)") {
      pqModel.knnJoin(encoded, queries, 100).count()
    }
    time("PQ ADC + exact refine to top-10 (2k queries)") {
      val short = pqModel.knnJoin(encoded, queries, 100)
        .select("query_id", "neighbor_id")
      pqModel.refine(short, vecs, queries, 10).count()
    }
    // join-only: reuses the hoisted quantizers, no fit inside the timer
    time("IVF-PQ knnJoin (nlist 64, nprobe 8, 2k queries)") {
      pqModel.knnJoinIvf(ivf64, vecs, queries, 10).count()
    }

    val distModel = time("distributed forest fit (20 trees, depth 14)") {
      graft.ann.DistributedAnnForest(numTrees = 20, maxLeafSize = 5, maxDepth = 14, seed = 42L)
        .fit(vecs, "vec_id", "embedding")
    }
    println("SCALE distributed planes: " + distModel.planes.size)
    time("distributed knnJoin (2k queries vs 200k corpus)") {
      distModel.knnJoin(queries, 10).count()
    }
    time("distributed knnSelfJoin (200k x 200k, zero routing)") {
      distModel.knnSelfJoin(10).count()
    }

    // 100k synthetic docs (20x sf0.1 documents)
    val words = (0 until 500).map(i => s"w$i")
    val docs = spark.range(100000).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => element_at(
          array(words.map(lit): _*),
          (pmod(xxhash64(col("id") * 100 + i), lit(500)) + 1).cast("int")))).as("text"))
      .repartition(64).cache()
    println("SCALE docs: " + docs.count())
    time("minhashPairs (100k docs)") {
      graft.operators.TextDedup.minhashPairs(docs, "doc_id", "text", 3, 32, 8, 0.5).count()
    }
    time("exact text dedup stats (100k docs)") {
      graft.operators.Dedup.stats(docs, Seq("text")).collect()
    }
    time("decontamination join (100k train x 5k bench, df cap 1000)") {
      graft.operators.TextDedup.contaminationPairs(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", ngram = 3, minFrac = 0.5, maxShingleDf = 1000).count()
    }

    // 20M candidate rows (4k keys x 5k candidates) — the per-key top-k
    // tail every kNN join ends with, custom heap operator vs the window
    // formulation it replaces. The heap shuffles ≤ partitions·k rows per
    // key; the window shuffles and sorts all 5k candidates per key.
    val cands = spark.range(20000000L).select(
      pmod(col("id"), lit(4000)).as("query_id"),
      col("id").as("neighbor_id"),
      (pmod(xxhash64(col("id")), lit(1000000)) / 1000.0).as("dist"))
      .repartition(64).cache()
    println("SCALE candidates: " + cands.count())
    time("top-10/key via TopKPerKey heap (20M rows, 4k keys)") {
      graft.plans.TopKPerKey.rankedTopK(cands, "query_id", Seq("dist", "neighbor_id"), 10).count()
    }
    time("top-10/key via window row_number (20M rows, 4k keys)") {
      import org.apache.spark.sql.expressions.Window
      cands.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))))
        .filter(col("rank") <= 10).count()
    }

    // pathological key skew: 90% of a 40M-row probe side lands on one
    // hot key; 1k-row build side. Compare a raw sort-merge join, AQE's
    // skew-join splitting, and the salted join (which breaks the hot
    // key itself). NOTE (measured): on one shared-memory node all three
    // are bandwidth-bound and salting buys no wall-clock — its value is
    // straggler elimination on a multi-node cluster, where the hot
    // key's single task serializes the stage on one executor.
    val skewed = spark.range(40000000L).select(
      when(col("id") % 10 < 9, lit(0L)).otherwise(pmod(col("id"), lit(1000))).as("k"),
      col("id").as("payload")).repartition(64).cache()
    val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v")).cache()
    println("SCALE skewed rows: " + skewed.count() + ", dim rows: " + dim.count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("skew join: raw sort-merge (hot key = 90% of 40M)") {
      skewed.join(dim, "k").agg(sum(col("v"))).collect()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("skew join: AQE skew splitting") {
      skewed.join(dim, "k").agg(sum(col("v"))).collect()
    }
    time("skew join: salted (16 buckets)") {
      graft.operators.SkewJoin.saltedInnerJoin(skewed, dim, "k", 16)
        .agg(sum(col("v"))).collect()
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }
}
