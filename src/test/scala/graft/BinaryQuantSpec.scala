package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.BinaryQuant
import graft.sources.Tables

/** Binary (1-bit) quantization + Hamming/rerank serving (q190). */
class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  private def refPack(v: Array[Float]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) < 0f) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }

  test("signPack matches a reference packer; NaN/-0.0/+0.0 pack to 0 bits") {
    // 65 dims forces the two-word boundary; index 64 negative pins word 1
    val v = Array.tabulate(65)(i => if (i % 3 == 0) -1.5f else 2f)
    v(64) = -7f
    val odd = Array(-0.0f, 0.0f, Float.NaN, -Float.MinPositiveValue)
    val rows = Seq((1L, v), (2L, odd)).toDF("id", "v")
      .select($"id", signPack($"v").as("bq"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(rows(1L).toSeq === refPack(v).toSeq)
    assert(rows(1L).length === 2)
    // strictly-negative-only convention: -0.0, +0.0, NaN all clear;
    // the smallest negative subnormal still sets its bit
    assert(rows(2L).toSeq === Seq(8L))
  }

  test("hammingPacked equals the naive sign-disagreement count") {
    val rnd = new scala.util.Random(42)
    val vecs = Array.fill(20)(Array.fill(130)(rnd.nextFloat() - 0.5f))
    val df = vecs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .select($"id", $"v", signPack($"v").as("bq"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter($"a.id" < $"b.id")
      .select($"a.id", $"b.id",
        hammingPacked($"a.bq", $"b.bq").as("ham"))
      .collect()
    assert(pairs.length === 190)
    pairs.foreach { r =>
      val (x, y) = (vecs(r.getLong(0).toInt), vecs(r.getLong(1).toInt))
      val naive = x.zip(y).count { case (a, b) => (a < 0f) != (b < 0f) }
      assert(r.getInt(2) === naive, s"pair ${r.getLong(0)}-${r.getLong(1)}")
    }
  }

  test("mismatched code lengths score the shared word prefix") {
    val df = Seq((Array(5L, 3L), Array(6L))).toDF("a", "b")
    // word 0: popcount(5^6)=popcount(3)=2; word 1 of a is ignored
    assert(df.select(hammingPacked($"a", $"b")).head().getInt(0) === 2)
  }

  test("topKRerank with full oversample (c = |corpus|) is exact cosine top-k") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count().toInt
    val queries = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = BinaryQuant.topKRerank(emb, queries, k = 5, c = n)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // exact reference: per-query cosine desc, id tiebreak
    val exact = emb.crossJoin(broadcast(queries))
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosine($"embedding", $"qvec").as("c"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"c".desc, $"neighbor_id")))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === exact)
  }

  test("bounded oversample keeps usable recall and never reorders (degrades to missing only)") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val exactRank = BinaryQuant.topKRerank(emb, queries, k = 10, c = emb.count().toInt)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val approx = BinaryQuant.topKRerank(emb, queries, k = 10, c = 50)
      .select($"query_id", $"rank", $"neighbor_id").collect()
    // recall@10 with a 5× oversample on 64-dim sign bits
    val hits = approx.count(r => exactRank.contains((r.getLong(0), r.getLong(2))))
    val recall = hits.toDouble / exactRank.size
    assert(recall >= 0.5, s"recall@10 was $recall")
    // rerank is exact, so surviving exact-top-k members keep their exact
    // relative order — the approximation degrades to gaps, never inversions
    approx.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val keptExactRanks = rows.sortBy(_.getInt(1))
        .flatMap(r => exactRank.get((r.getLong(0), r.getLong(2))))
      assert(keptExactRanks.sameElements(keptExactRanks.sorted),
        s"inversion in kept ranks: ${keptExactRanks.toSeq}")
    }
  }

  test("bqAsymDot equals the naive sign-reconstructed dot") {
    val rnd = new scala.util.Random(193)
    val docs = Array.fill(15)(Array.fill(130)(rnd.nextFloat() - 0.5f))
    val q = Array.fill(130)(rnd.nextFloat() - 0.5f)
    val df = docs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v, q) }
      .toDF("id", "v", "q")
      .select($"id", $"q", signPack($"v").as("bq"))
    val got = df.select($"id", bqAsymDot($"q", $"bq").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.zipWithIndex.foreach { case (v, i) =>
      val naive = q.zip(v).map { case (qv, dv) =>
        if (dv < 0f) -qv.toDouble else qv.toDouble }.sum
      assert(math.abs(got(i.toLong) - naive) < 1e-9, s"doc $i")
    }
  }

  test("topKRerankAsym with full oversample is exact; recall beats symmetric at c=50") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count().toInt
    val queries = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(BinaryQuant.topKRerankAsym(emb, queries, k = 10, c = n))
    val exactSym = ids(BinaryQuant.topKRerank(emb, queries, k = 10, c = n))
    assert(exact === exactSym, "full oversample must agree across first passes")
    val asym = ids(BinaryQuant.topKRerankAsym(emb, queries, k = 10, c = 50))
    val sym = ids(BinaryQuant.topKRerank(emb, queries, k = 10, c = 50))
    val (ra, rs) = ((asym & exact).size.toDouble / exact.size,
      (sym & exact).size.toDouble / exact.size)
    assert(ra >= rs, s"asym recall $ra should be >= sym recall $rs")
  }

  test("SQL faces sign_pack / hamming_packed match the DataFrame path") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    emb.createOrReplaceTempView("bq_emb")
    val sql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib,
           hamming_packed(sign_pack(a.embedding), sign_pack(b.embedding)) h
         FROM bq_emb a JOIN bq_emb b ON a.vec_id < b.vec_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val df = emb.select($"vec_id", signPack($"embedding").as("bq"))
    val viaDf = df.as("a").crossJoin(df.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        hammingPacked($"a.bq", $"b.bq").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(sql === viaDf)
  }
}
