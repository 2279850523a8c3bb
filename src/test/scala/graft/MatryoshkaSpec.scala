package graft

import org.apache.spark.sql.functions._
import graft.operators.Matryoshka
import graft.sources.Tables

/** Matryoshka prefix-dim serving + dim audit (q192). */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val queries = emb.filter($"vec_id" % 100 === 0)
    .select($"vec_id".as("query_id"), $"embedding".as("qvec"))

  private def cosPrefix(a: Array[Float], b: Array[Float], d: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < d) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  test("prefixRerank with full oversample equals exact full-dim cosine top-k") {
    val n = emb.count().toInt
    val got = Matryoshka.prefixRerank(emb, queries, k = 5, c = n, dPrefix = 16)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val exact = vecs.keys.filter(_ % 100 == 0).flatMap { q =>
      vecs.toSeq.map { case (id, v) => (id, cosPrefix(v, vecs(q), 64)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }.toSet
    assert(got === exact)
  }

  test("bounded oversample degrades to missing only (no inversions) and keeps recall") {
    val n = emb.count().toInt
    val exactRank = Matryoshka.prefixRerank(emb, queries, k = 10, c = n, dPrefix = 16)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val approx = Matryoshka.prefixRerank(emb, queries, k = 10, c = 50, dPrefix = 16)
      .select($"query_id", $"rank", $"neighbor_id").collect()
    val hits = approx.count(r => exactRank.contains((r.getLong(0), r.getLong(2))))
    val recall = hits.toDouble / exactRank.size
    // synthetic embeddings are NOT matryoshka-trained — prefix dims
    // carry only proportional signal, so this pins the deterministic
    // floor (real MRL embeddings would sit far higher)
    assert(recall >= 0.4, s"recall@10 was $recall")
    approx.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val kept = rows.sortBy(_.getInt(1))
        .flatMap(r => exactRank.get((r.getLong(0), r.getLong(2))))
      assert(kept.sameElements(kept.sorted), s"inversion: ${kept.toSeq}")
    }
  }

  test("overlapReport matches a local reference and reports every (dim, query)") {
    val dims = Seq(8, 16, 32)
    val got = Matryoshka.overlapReport(emb, queries, k = 10, dims = dims, fullDim = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qids = vecs.keys.filter(_ % 100 == 0).toSeq
    def topk(q: Long, d: Int): Set[Long] =
      vecs.toSeq.map { case (id, v) => (id, cosPrefix(v, vecs(q), d)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    assert(got.keySet === (for (d <- dims; q <- qids) yield (d, q)).toSet)
    for (d <- dims; q <- qids)
      assert(got((d, q)) === (topk(q, d) & topk(q, 64)).size.toLong,
        s"dim $d query $q")
    // the audit's purpose: aggregate overlap should not collapse at 32 dims
    val mean32 = qids.map(q => got((32, q))).sum.toDouble / qids.size
    assert(mean32 >= 3.0, s"mean overlap@10 at dim 32 was $mean32")
  }
}
