package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramTokenizer

/** Unigram-LM tokenizer (Kudo 2018): hand-checked Viterbi lattices and
  * tie rules, MaxMatch greediness, exhaustive-enumeration optimality,
  * EM monotonicity/normalization, distributed fit ≡ local fit, and the
  * committed-asset faces (ids, gate metrics, save/load). */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  // a tiny hand-computable cost table: cheap whole words, mid bigrams,
  // expensive chars (costs are −1e6·ln p shaped but any positive
  // integers exercise the DP identically)
  private val costs = Map[String, Long](
    "a" -> 100L, "b" -> 100L, "c" -> 100L,
    "ab" -> 150L, "bc" -> 150L, "abc" -> 180L)
  private val ids: Map[String, Long] =
    costs.keys.toSeq.sorted.zipWithIndex.map { case (p, i) => p -> (i + 1L) }.toMap

  test("viterbi picks the DP optimum over a hand-checked lattice") {
    // abc: [abc]=180 beats [ab,c]=250, [a,bc]=250, [a,b,c]=300
    assert(UnigramTokenizer.viterbi("abc", costs).toSeq === Seq("abc"))
    // abcbc: [abc,bc]=330 beats [ab,c,bc]=400, [a,bc,bc]=400 …
    assert(UnigramTokenizer.viterbi("abcbc", costs).toSeq === Seq("abc", "bc"))
  }

  test("viterbi ties prefer fewer pieces, then the longest final piece") {
    // make [ab,c] and [a,bc] and [abc] all cost 200
    val tied = Map[String, Long]("a" -> 100L, "c" -> 100L,
      "ab" -> 100L, "bc" -> 100L, "b" -> 999L, "abc" -> 200L)
    // one piece beats two at equal cost
    assert(UnigramTokenizer.viterbi("abc", tied).toSeq === Seq("abc"))
    // between [ab,c] and [a,bc] (equal cost, equal count): the longest
    // FINAL piece wins — bc over c
    val noWhole = tied - "abc"
    assert(UnigramTokenizer.viterbi("abc", noWhole).toSeq === Seq("a", "bc"))
  }

  test("out-of-alphabet characters consume singly as unk at UnkCost") {
    val segs = UnigramTokenizer.viterbi("axb", costs)
    assert(segs.toSeq === Seq("a", UnigramTokenizer.Unk, "b"))
    assert(UnigramTokenizer.viterbiCost("axb", costs) ===
      200L + UnigramTokenizer.UnkCost)
  }

  test("viterbi equals exhaustive minimum over every segmentation of short words") {
    // brute-force all 2^(n-1) segmentations, same unk fallback rule
    def allCosts(w: String): Seq[Long] = {
      def rec(i: Int): Seq[Long] =
        if (i == w.length) Seq(0L)
        else (i + 1 to math.min(w.length, i + 6)).flatMap { j =>
          val piece = w.substring(i, j)
          costs.get(piece) match {
            case Some(c) => rec(j).map(_ + c)
            case None if j - i == 1 => rec(j).map(_ + UnigramTokenizer.UnkCost)
            case None => Seq.empty
          }
        }
      rec(0)
    }
    val words = Seq("a", "ab", "abc", "abcabc", "cabcab", "bba", "xaxbcx")
    words.foreach { w =>
      assert(UnigramTokenizer.viterbiCost(w, costs) === allCosts(w).min,
        s"word $w")
    }
  }

  test("maxMatch consumes greedily and can be strictly worse than viterbi") {
    // the classic greedy trap: taking the longest prefix "ab" blocks
    // the cheap "bbc" that an optimal split reaches via "a"
    val t = Map[String, Long]("a" -> 100L, "b" -> 100L, "c" -> 100L,
      "ab" -> 10L, "bbc" -> 10L)
    // greedy: ab, b, c = 210; optimal: a, bbc = 110
    assert(UnigramTokenizer.maxMatch("abbc", t).toSeq === Seq("ab", "b", "c"))
    assert(UnigramTokenizer.viterbi("abbc", t).toSeq === Seq("a", "bbc"))
    assert(UnigramTokenizer.viterbiCost("abbc", t) <
      UnigramTokenizer.segmentationCost(
        UnigramTokenizer.maxMatch("abbc", t), t))
  }

  test("fitLocal: EM likelihood non-decreasing within rounds; probs normalized; deterministic") {
    val hist = Seq(("lowlow", 5L), ("lower", 3L), ("slow", 4L),
      ("flow", 2L), ("glow", 6L), ("low", 9L))
    val fit = UnigramTokenizer.fitLocal(hist, vocabSize = 12,
      seedSize = 30, emIters = 3, maxPieceLen = 4)
    fit.likelihoodTrajectories.foreach { t =>
      t.lazyZip(t.tail).foreach((a, b) =>
        assert(b >= a - 1e-9 * math.abs(a), s"trajectory $t"))
    }
    assert(math.abs(fit.pieces.iterator.map(_._2).sum - 1.0) < 1e-9)
    // every single char survives pruning; vocab fits the budget
    val chars = hist.flatMap(_._1.map(_.toString)).distinct
    chars.foreach(c => assert(fit.pieces.exists(_._1 == c), s"char $c"))
    assert(fit.pieces.count(_._1.length >= 2) + chars.size <= 12)
    // determinism: same histogram → identical table
    val fit2 = UnigramTokenizer.fitLocal(hist, vocabSize = 12,
      seedSize = 30, emIters = 3, maxPieceLen = 4)
    assert(fit.pieces === fit2.pieces)
    // "low" is a substring of every word type — EM must keep it as a
    // high-probability piece
    val lowP = fit.pieces.toMap.apply("low")
    assert(lowP > 0.1, s"p(low) = $lowP")
  }

  test("fitLocal rejects a vocab budget below the alphabet (would never terminate)") {
    val ex = intercept[IllegalArgumentException] {
      UnigramTokenizer.fitLocal(Seq(("abcdefgh", 3L)), vocabSize = 4)
    }
    assert(ex.getMessage.contains("alphabet"))
  }

  test("distributed fit over a DataFrame equals fitLocal on the histogram") {
    val hist = Seq(("glow", 6L), ("low", 9L), ("slow", 4L))
    val docs = hist.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .grouped(5).map(_.mkString(" ")).toSeq.toDF("text")
    val viaDf = UnigramTokenizer.fit(docs, "text", vocabSize = 10,
      seedSize = 20, emIters = 2, maxPieceLen = 4)
    val local = UnigramTokenizer.fitLocal(hist, vocabSize = 10,
      seedSize = 20, emIters = 2, maxPieceLen = 4)
    assert(viaDf.pieces === local.pieces)
  }

  test("column faces: ids round-trip the committed asset's decisions; gate metrics agree") {
    val df = Seq((1L, "the fast batch"), (2L, "zzz join")).toDF("id", "text")
    val v = df.select(col("id"), UnigramTokenizer.viterbiIds(col("text"),
        PieceAssets.costs, PieceAssets.ids, PieceAssets.MaxPieceLen).as("ids"))
      .orderBy(col("id")).collect()
    val invIds = PieceAssets.ids.map(_.swap)
    // doc 1 decodes losslessly (all chars in the committed alphabet)
    val dec1 = v(0).getSeq[Long](1).map(invIds).mkString("")
    assert(dec1 === "thefastbatch")
    // doc 2: 'z' is out-of-alphabet → id 0 appears
    assert(v(1).getSeq[Long](1).contains(0L))
    // gate metrics: viterbi ≤ maxmatch ≤/≥ chars relations hold rowwise
    val g = df.select(UnigramTokenizer.gateMetrics(col("text"),
        PieceAssets.costs, PieceAssets.MaxPieceLen).as("g"))
      .select(col("g._1").as("v"), col("g._2").as("m"), col("g._3").as("c"))
      .collect()
    g.foreach { r =>
      assert(r.getLong(0) <= r.getLong(1) && r.getLong(0) <= r.getLong(2))
    }
  }

  test("save/load round-trips the piece table with stable ids") {
    val path = java.nio.file.Files.createTempDirectory("unigram").toString
    val pieces = Seq(("ab", 1234L), ("a", 999L), ("b", 777L))
    UnigramTokenizer.save(spark, pieces, path)
    val (c2, i2) = UnigramTokenizer.load(spark, path)
    assert(c2 === pieces.toMap)
    // ids follow lexicographic piece order, 0 reserved for unk
    assert(i2 === Map("a" -> 1L, "ab" -> 2L, "b" -> 3L))
  }
}
