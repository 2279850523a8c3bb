package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.{BinaryQuant, Matryoshka}
import graft.sources.Tables

/** The embedding-compression serving audit at sf0.1 (5,000 vectors ×
  * 64 dims, 50 queries): recall@10 vs the exact cosine top-k and warm
  * wall time (min of 2) for every compressed first pass at the same
  * oversample c — the measured table behind choosing a serving tier:
  *
  *   exact       — brute full-precision cosine (the truth, 1× bytes)
  *   bq_sym      — packed sign bits, popcount Hamming (32× smaller scan)
  *   bq_asym     — full-precision query × sign-reconstructed docs (32×)
  *   mrl16/mrl32 — prefix-dim cosine first pass (4× / 2×)
  *   sq8         — int8 codes, decoded-dot first pass (4×)
  *
  * All paths share the exact-cosine rerank and the broadcast-out /
  * broadcast-back two-stage shape, so the delta IS the first pass.
  */
object ProbeCompression {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val k = 10
    val c = 50

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // SQ8 first pass through the same two-stage harness: decoded dot
    // (scale_q·scale_d·Σ code_q·code_d ∝ dot for ranking) on 4× codes
    def sq8TopC(): DataFrame = {
      val codes = emb.select(col("vec_id"),
        sq8Codes(col("embedding"), sq8Scale(col("embedding"))).as("__code"),
        sq8Scale(col("embedding")).as("__scale"))
      val q = queries.select(col("query_id"),
        sq8Codes(col("qvec"), sq8Scale(col("qvec"))).as("__qcode"))
      val scored = graft.GraftSession.widen(codes).crossJoin(broadcast(q))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (-col("__scale") * aggregate(zip_with(col("__code"), col("__qcode"),
            (a, b) => a * b), lit(0L), (acc, x) => acc + x).cast("double"))
            .as("__neg"))
      graft.plans.TopKPerKey.perKey(
        scored, Seq("query_id"), Seq("__neg", "neighbor_id"), c)
    }

    // the cosine truth: the shared two-stage harness at full oversample
    val n = emb.count().toInt
    val truth = pairs(BinaryQuant.topKRerank(emb, queries, k, n))

    val paths: Seq[(String, () => DataFrame)] = Seq(
      "bq_sym" -> (() => BinaryQuant.topKRerank(emb, queries, k, c)),
      "bq_asym" -> (() => BinaryQuant.topKRerankAsym(emb, queries, k, c)),
      "mrl16" -> (() => Matryoshka.prefixRerank(emb, queries, k, c, 16)),
      "mrl32" -> (() => Matryoshka.prefixRerank(emb, queries, k, c, 32)))

    def time(f: () => DataFrame): (Double, Set[(Long, Long)]) = {
      def once(): (Double, Set[(Long, Long)]) = {
        val t0 = System.nanoTime()
        val p = pairs(f())
        ((System.nanoTime() - t0) / 1e9, p)
      }
      val (t1, p1) = once(); val (t2, _) = once()
      (math.min(t1, t2), p1)
    }
    val (tExact, _) = time(() =>
      BinaryQuant.topKRerank(emb, queries, k, n).select(
        col("query_id"), col("neighbor_id")))
    println(f"PATH=exact warmSecs=$tExact%.2f recall=1.000")
    paths.foreach { case (name, f) =>
      val (t, p) = time(f)
      val recall = (p & truth).size.toDouble / truth.size
      println(f"PATH=$name warmSecs=$t%.2f recall=$recall%.3f")
    }
    // sq8: measure the candidate cut (rerank recall ≡ candidate recall,
    // since the shared exact rerank can only drop, never reorder)
    val (tSq, pSqCand) = time(() => sq8TopC()
      .select(col("query_id"), col("neighbor_id")))
    val sqHits = truth.count { case (q, nid) => pSqCand((q, nid)) }
    println(f"PATH=sq8_cand warmSecs=$tSq%.2f candRecall=${sqHits.toDouble / truth.size}%.3f")
    spark.stop()
  }
}
