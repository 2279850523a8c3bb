package graft.tools

import org.apache.spark.sql.functions._

/** Focused probe: IVF-PQ join-only timing at 200k×64, isolating the
  * scoring formulation (decode + native kernel vs earlier UDF shapes).
  * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.ProbeIvfPq" */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val vecs = spark.range(200000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 1000.0).cast("float")).as("embedding"))
      .repartition(64).cache()
    vecs.count()
    val queries = vecs.filter(col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val pq = time("PQ fit") { graft.ann.PqIndex(m = 8, seed = 42L).fit(vecs) }
    val ivf = time("IVF fit (nlist 64, nprobe 8)") { graft.ann.IvfIndex(64, 8).fit(vecs) }
    time("IVF raw join (2k queries)") { ivf.knnJoin(vecs, queries, 10).count() }
    time("IVF-PQ join (2k queries, decode+native kernel)") {
      pq.knnJoinIvf(ivf, vecs, queries, 10).count()
    }
    time("IVF-PQ join repeat (warm)") {
      pq.knnJoinIvf(ivf, vecs, queries, 10).count()
    }
    spark.stop()
  }
}
