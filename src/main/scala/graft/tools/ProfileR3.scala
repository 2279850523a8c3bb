package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-3 scratch profiler: where do q35/q37 spend their time? */
object ProfileR3 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val e = graft.sources.Tables.embeddings(spark, sfDir)
    e.cache().count()

    // ---- q37 decomposition ----
    val model37 = t("ivf.fit") {
      graft.ann.IvfIndex(nlist = 16, nprobe = 4).fit(e)
    }
    val queries37 = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    t("ivf.knnJoin") {
      model37.knnJoin(e, queries37, topK = 10).count()
    }
    t("ivf.fit(again)") {
      graft.ann.IvfIndex(nlist = 16, nprobe = 4).fit(e)
    }

    // ---- q35 decomposition ----
    val model35 = t("forest.fit") {
      graft.ann.AnnForest(numTrees = 50, maxLeafSize = 5, seed = 42L)
        .fit(e, "vec_id", "embedding")
    }
    val queries35 = e.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    t("forest.assignLeaves(corpus)") {
      model35.assignLeaves(
        e.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cvec")), "__cvec").count()
    }
    t("forest.knnJoinBucketed") {
      model35.knnJoinBucketed(e, queries35, topK = 10).count()
    }
    t("forest.knnJoinBucketed(2)") {
      model35.knnJoinBucketed(e, queries35, topK = 10).count()
    }

    spark.stop()
  }
}
