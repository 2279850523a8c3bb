package graft.tools

import org.apache.spark.sql.functions._

/** Round-4 scratch profiler: stage-level decomposition of q35's
  * bucketed kNN join (the dominant bench entry at sf0.1). */
object ProfileQ35 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(cpus)
    import graft.functions.VectorFunctions.sqEucDist

    val e = graft.sources.Tables.embeddings(spark, sfDir)
    e.cache().count()

    val model = t("fit") {
      graft.ann.AnnForest(numTrees = 50, maxLeafSize = 5, seed = 42L)
        .fit(e, "vec_id", "embedding")
    }
    val queries = e.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    // warm the whole path once (JIT + codegen + classloading)
    t("whole q35 (cold)") {
      model.knnJoinBucketed(e, queries, topK = 10).count()
    }

    // ---- warm decomposition ----
    val corpusRouted = model.assignLeaves(
      e.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cvec")), "__cvec")
    val queriesRouted = model.assignLeaves(
      queries.select(col("query_id"), col("qvec").as("__qv")), "__qv")
    t("route corpus (warm)") { corpusRouted.count() }
    t("route queries (warm)") { queriesRouted.count() }

    val joined = queriesRouted.join(corpusRouted, Seq("tree_id", "leaf_id"))
      .select(col("query_id"), col("neighbor_id"),
        sqEucDist(col("__cvec"), col("__qv")).as("dist"))
    t("route+join+dist (warm)") { joined.count() }

    val dedup = joined.repartition(col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(min(col("dist")).as("dist"))
    t("route+join+dedup (warm)") { dedup.count() }

    val topk = graft.plans.TopKPerKey.rankedTopK(
      dedup, "query_id", Seq("dist", "neighbor_id"), 10)
    t("full pipeline (warm)") { topk.count() }
    t("full pipeline (warm 2)") { topk.count() }
    t("full + orderBy (bench shape)") {
      model.knnJoinBucketed(e, queries, topK = 10)
        .orderBy(col("query_id"), col("rank")).count()
    }

    val selfJoin = model.knnSelfJoinBucketed(e, topK = 10)
    t("selfJoin (cold)") { selfJoin.count() }
    t("selfJoin (warm)") { selfJoin.count() }
    t("selfJoin + orderBy (bench shape)") {
      model.knnSelfJoinBucketed(e, topK = 10)
        .orderBy(col("query_id"), col("rank")).count()
    }

    // ---- experiment: bucket-kernel pair generation (one Generate over
    // a per-bucket UDF emitting compact (q, n, dist) triples) vs the
    // current double-Generate struct expansion ----
    {
      import org.apache.spark.sql.Row
      val routed = model.assignLeaves(
        e.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cvec")), "__cvec")
      val pairsUdf = udf { (ms: Seq[Row]) =>
        val n = ms.length
        val ids = new Array[Long](n)
        val vecs = new Array[Array[Float]](n)
        var i = 0
        while (i < n) { ids(i) = ms(i).getLong(0); vecs(i) = ms(i).getSeq[Float](1).toArray; i += 1 }
        val out = new Array[(Long, Long, Double)](n * n)
        var k = 0
        i = 0
        while (i < n) {
          var j = 0
          val a = vecs(i)
          while (j < n) {
            val b = vecs(j)
            var acc = 0.0
            var d = 0
            while (d < a.length) { val x = a(d).toDouble - b(d).toDouble; acc += x * x; d += 1 }
            out(k) = (ids(i), ids(j), acc); k += 1
            j += 1
          }
          i += 1
        }
        out
      }
      val kernel = routed
        .groupBy(col("tree_id"), col("leaf_id"))
        .agg(collect_list(struct(col("neighbor_id"), col("__cvec"))).as("__ms"))
        .select(explode(pairsUdf(col("__ms"))).as("__p"))
        .select(col("__p._1").as("query_id"), col("__p._2").as("neighbor_id"),
          col("__p._3").as("dist"))
      val kernelDedup = kernel.repartition(col("query_id"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(min(col("dist")).as("dist"))
      val kernelTopK = graft.plans.TopKPerKey.rankedTopK(
        kernelDedup, "query_id", Seq("dist", "neighbor_id"), 10)
      t("kernel selfJoin (cold)") { kernelTopK.count() }
      t("kernel selfJoin (warm)") { kernelTopK.count() }
      t("kernel selfJoin (warm 2)") { kernelTopK.count() }
    }

    println("---- full knnJoinBucketed plan ----")
    model.knnJoinBucketed(e, queries, topK = 10).explain("formatted")
    spark.stop()
  }
}
