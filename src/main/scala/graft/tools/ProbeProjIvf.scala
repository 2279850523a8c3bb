package graft.tools

import org.apache.spark.sql.functions._

/** Why is IVF-on-projected slower than IVF-on-raw in ScaleProbeR5?
  * Hypothesis: projection reshapes the synthetic uniform-box corpus
  * into a Gaussian-ish ball, skewing k-means cell occupancy — the
  * probed-candidate volume (Σ per-query candidates), not the kernel
  * width, drives join cost. Prints cell-size distribution and the
  * candidate-row count for both spaces. */
object ProbeProjIvf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val vecs = spark.range(200000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 1000.0).cast("float")).as("embedding"))
      .repartition(64).cache()
    vecs.count()
    val projected = vecs.select(col("vec_id"),
      graft.functions.RandomProjection.project(col("embedding"), 64, 16)
        .cast("array<float>").as("embedding")).cache()
    projected.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // raw FIRST this time (ScaleProbeR5 ran projected first) — if the
    // 2x gap flips with the order, it was JIT/warmup, not geometry
    for ((name, df) <- Seq(("raw64", vecs), ("proj16", projected), ("raw64_again", vecs))) {
      val model = graft.ann.IvfIndex(64, 8).fit(df)
      val cells = model.assignCells(df.select(col("vec_id"), col("embedding")), "embedding", 1)
        .groupBy(col("cell")).count().collect().map(_.getLong(1)).sorted
      val queries = df.filter(col("vec_id") < 2000)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val q = model.assignCells(queries, "qvec", 8)
      val c = model.assignCells(df.select(col("vec_id").as("n"), col("embedding").as("cv")), "cv", 1)
      val candidates = q.join(c, Seq("cell")).count()
      println(s"PROBE $name: cells min=${cells.head} p50=${cells(cells.length / 2)} " +
        s"max=${cells.last} candidates=$candidates")
      time(s"$name fit+join") {
        graft.ann.IvfIndex(64, 8).fit(df).knnJoin(df, queries, 10).count()
      }
    }
    spark.stop()
  }
}
