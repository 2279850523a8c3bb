package graft

import graft.operators.NbClassifier

/** Multinomial NB classifier: hand-computed telescoped scores, the
  * learning demonstration the fixture queries cannot provide (the
  * driver fixtures' lang/source labels are textless noise — q217
  * gates fit+serve ENGINE PARITY; separability lives here), and the
  * deterministic tie-break. */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scores match the telescoped closed form by hand") {
    // train: x:"a a b" (T=3), y:"c c" (T=2); N=2, V=|{a,b,c}|=3
    val train = Seq((1L, "a a b", "x"), (2L, "c c", "y"))
      .toDF("doc_id", "text", "label")
    val probe = Seq((9L, "a c")).toDF("doc_id", "text")
    val got = NbClassifier.scoreAgainst(probe, train).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    // score_x = ln(1/2) − 2·ln(3+3) + (ln(2+1) + ln(0+1))
    assert(got("x") === r4(math.log(1.0 / 2) - 2 * math.log(6.0) + math.log(3.0)))
    // score_y = ln(1/2) − 2·ln(2+3) + (ln(0+1) + ln(2+1))
    assert(got("y") === r4(math.log(1.0 / 2) - 2 * math.log(5.0) + math.log(3.0)))
    // y's smaller smoothing denominator wins: "a" is unseen in BOTH
    // classes, "c" seen only in y
    val pred = NbClassifier.classify(probe, train).collect().head
    assert(pred.getString(1) === "y")
  }

  test("separable vocabularies classify perfectly; OOV-only docs fall back to the prior side") {
    // two disjoint vocabularies — the signal the fixtures lack
    val vocabA = Vector("alpha", "beta", "gamma", "delta")
    val vocabB = Vector("omega", "sigma", "kappa", "lambda")
    def doc(v: Vector[String], seed: Int): String =
      Vector.tabulate(12)(i => v((seed * 7 + i * 3) % v.size)).mkString(" ")
    val train = (Seq.tabulate(40)(i => (i.toLong, doc(vocabA, i), "A")) ++
      Seq.tabulate(40)(i => (100L + i, doc(vocabB, i), "B")))
      .toDF("doc_id", "text", "label")
    val probe = (Seq.tabulate(10)(i => (200L + i, doc(vocabA, 50 + i), "A")) ++
      Seq.tabulate(10)(i => (300L + i, doc(vocabB, 50 + i), "B")))
      .toDF("doc_id", "text", "truth")
    val pred = NbClassifier.classify(probe.select($"doc_id", $"text"), train)
      .join(probe.select($"doc_id", $"truth"), "doc_id")
    assert(pred.filter($"pred" === $"truth").count() === 20L)
    // a fully-OOV doc gets no hit terms anywhere: decided by
    // prior + n_d·logden only (equal classes here ⇒ label-asc tie)
    val oov = NbClassifier.classify(
      Seq((999L, "zzz qqq")).toDF("doc_id", "text"), train).collect().head
    assert(oov.getString(1) === "A")
  }

  test("exact score ties break by label ascending") {
    // perfectly symmetric classes: identical counts under renaming
    val train = Seq((1L, "a a", "m"), (2L, "b b", "k"))
      .toDF("doc_id", "text", "label")
    // probe "a b" hits both classes identically → scores tie exactly
    val sc = NbClassifier.scoreAgainst(
      Seq((5L, "a b")).toDF("doc_id", "text"), train).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(sc("m") === sc("k"))
    val pred = NbClassifier.classify(
      Seq((5L, "a b")).toDF("doc_id", "text"), train).collect().head
    assert(pred.getString(1) === "k", "tie must go to the ascending label")
  }
}
