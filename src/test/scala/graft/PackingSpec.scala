package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(String, Long, Long)], budget: Long) =
    Packing.packGreedy(rows.toDF("src", "doc_id", "tok"),
        "doc_id", "tok", "src", budget)
      .as[(String, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap

  test("greedy fill: first overflow starts a new bin, per group, in id order") {
    val bins = pack(Seq(
      ("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 20L), ("a", 4L, 100L),
      ("b", 1L, 100L), ("b", 2L, 1L)), budget = 100)
    // group a: 50+40=90, +20 overflows → bin 1; 20+100 overflows → bin 2
    assert(bins(("a", 1L)) === 0 && bins(("a", 2L)) === 0)
    assert(bins(("a", 3L)) === 1)
    assert(bins(("a", 4L)) === 2)
    // group b packs independently: exactly-full bin, then next doc breaks
    assert(bins(("b", 1L)) === 0 && bins(("b", 2L)) === 1)
  }

  test("oversized doc occupies one bin of its own; no empty bins; bins are contiguous") {
    val bins = pack(Seq(
      ("g", 1L, 10L), ("g", 2L, 500L), ("g", 3L, 10L)), budget = 100)
    assert(bins(("g", 1L)) === 0)
    assert(bins(("g", 2L)) === 1, "oversized doc gets its own bin, not two")
    assert(bins(("g", 3L)) === 2)
  }

  test("fixture invariants: budget respected except single-doc bins; order monotone") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("tok"))
    val packed = Packing.packGreedy(docs, "doc_id", "tok", "source", 256)
    val perBin = packed.groupBy($"grp", $"bin")
      .agg(sum($"tokens").as("t"), count(lit(1)).as("n")).collect()
    perBin.foreach { r =>
      assert(r.getLong(2) <= 256 || r.getLong(3) === 1L,
        s"bin over budget with >1 doc: ${r.mkString(",")}")
    }
    // bin index is non-decreasing in doc order within each group
    val bad = packed.as[(String, Long, Long, Int)].collect()
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._4).toSeq)
      .count(s => s.zip(s.tail).exists { case (a, b) => b < a || b > a + 1 })
    assert(bad === 0, "bin indices must step by 0 or 1 in id order")
  }

  test("stride-chunk membership arithmetic equals the brute window definition") {
    // the q159 kmin/kmax formulas (all-positive arithmetic so Spark's
    // truncating `div` matches DuckDB's floor `//`) vs brute force:
    // chunk k holds pos p iff k*S <= p < k*S + L
    val L = 64; val S = 32
    val got = spark.range(0, 300).toDF("pos")
      .withColumn("kmin", when($"pos" < L, lit(0L))
        .otherwise(expr(s"(pos - $L + $S) div $S")))
      .withColumn("k", explode(sequence($"kmin", expr(s"pos div $S"))))
      .select($"pos", $"k").collect()
      .groupBy(_.getLong(0)).map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    for (p <- 0L until 300L) {
      val brute = (0L to p / S).filter(k => k * S <= p && p < k * S + L).toSet
      assert(got(p) === brute, s"pos $p")
    }
  }

  test("paddingWasteCurve: hand-checked waste at widths 1/global, monotone in width") {
    // token lengths 2, 3, 4, 10
    val docs = Seq("a b", "a b c", "a b c d", ("x " * 10).trim)
      .toDF("text")
    val got = graft.operators.Packing.paddingWasteCurve(docs, "text",
        widths = Seq(1, 4, 0))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // w=1: every doc its own-length bucket → zero padding
    assert(got(1)._4 === 0.0 && got(1)._2 === 19L && got(1)._3 === 19L)
    // global: pad all 4 docs to 10 → padded 40, waste 1 - 19/40
    assert(got(0) === ((1L, 19L, 40L,
      BigDecimal(1.0 - 19.0 / 40).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // w=4: buckets {2,3}→pad 3, {4}→4, {10}→10: padded 6+4+10 = 20
    assert(got(4)._3 === 20L)
    // waste can only grow (weakly) as buckets widen
    assert(got(1)._4 <= got(4)._4 && got(4)._4 <= got(0)._4)
  }

  // ---- sliding-window chunking ----

  test("chunking: window placement, tail reach, and no suffix-duplicate chunks") {
    def chunksOf(text: String, w: Int, s: Int): Seq[(Int, Int, String)] =
      graft.operators.Chunking.chunk(
          Seq((1L, text)).toDF("doc_id", "text"), window = w, stride = s)
        .orderBy($"chunk_id").collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    // n=5, w=3, s=2: starts 0 and 2, tail reaches the end
    assert(chunksOf("a b c d e", 3, 2) ===
      Seq((0, 3, "a b c"), (1, 3, "c d e")))
    // n=6, w=3, s=2: last chunk SHORTER than the window but reaches 6
    assert(chunksOf("a b c d e f", 3, 2) ===
      Seq((0, 3, "a b c"), (1, 3, "c d e"), (2, 2, "e f")))
    // n <= w: exactly one chunk, the doc itself
    assert(chunksOf("a b c", 3, 2) === Seq((0, 3, "a b c")))
    // stride = window: disjoint tiling, no overlap
    assert(chunksOf("a b c d", 2, 2) === Seq((0, 2, "a b"), (1, 2, "c d")))
    // n = w + s exactly: second chunk is FULL and ends at n — and a
    // third start (2s) would be a strict suffix, so there is none
    assert(chunksOf("a b c d e", 3, 2).size === 2)
  }

  test("chunking: tokens round-trip — concatenating stride prefixes rebuilds the doc") {
    val doc = (1 to 23).map(i => s"t$i").mkString(" ")
    val ch = graft.operators.Chunking.chunk(
        Seq((7L, doc)).toDF("doc_id", "text"), window = 8, stride = 5)
      .orderBy($"chunk_id").collect().map(r => (r.getInt(1), r.getString(3)))
    // the first `stride` tokens of each non-final chunk end exactly
    // where the last chunk starts, so prefixes + last chunk = the doc
    val rebuilt = (ch.init.map(_._2.split(" ").take(5)) :+
      ch.last._2.split(" ")).flatten.mkString(" ")
    assert(rebuilt === doc)
  }
}
