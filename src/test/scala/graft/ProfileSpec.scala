package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile matches hand counts (nulls, distincts, min/max typing rules)") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(1.0)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(9.0))
    ).toDF("id", "s", "f")
    val got = Profile.profile(df, Seq("id", "s", "f"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") === (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(got("s") === (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
    // double column: counts yes, min/max deliberately null
    // (cross-engine float rendering is not stable)
    assert(got("f") === (("f", 4L, 1L, 3L, None, None)))
  }

  test("one corpus pass: multi-distinct plans as a single Expand, no per-column jobs") {
    val df = graft.sources.Tables.documents(spark, sf0001)
    val out = Profile.profile(df, Seq("doc_id", "lang", "source"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(!plan.toLowerCase.contains("union"), "per-column scans would union\n" + plan)
  }

  test("empty column list fails loud") {
    intercept[IllegalArgumentException] {
      Profile.profile(Seq((1, 2)).toDF("a", "b"), Nil)
    }
    intercept[IllegalArgumentException] {
      Profile.approxProfile(Seq((1, 2)).toDF("a", "b"), Nil)
    }
  }

  test("quantile columns: numeric get sketched percentiles in the rank window, non-numeric null (r12)") {
    val df = graft.sources.Tables.documents(spark, sf0001)
    val eps = graft.functions.KllSketch.normalizedRankError(200)
    val rep = Profile.approxProfile(df, Seq("n_chars", "lang"),
      quantiles = Seq(0.5, 0.95)).collect().map(r => r.getString(0) -> r).toMap
    // non-numeric: both quantile columns null (the min/max discipline)
    assert(rep("lang").isNullAt(6) && rep("lang").isNullAt(7))
    // numeric: realized rank of the served value within p ± 3ε
    val n = df.count().toDouble
    for ((p, i) <- Seq(0.5 -> 6, 0.95 -> 7)) {
      val v = rep("n_chars").getDouble(i)
      val lo = df.filter(s"n_chars < $v").count() / n
      val hi = df.filter(s"n_chars <= $v").count() / n
      assert(lo <= p + 3 * eps && hi >= p - 3 * eps,
        s"p$p served $v with rank window [$lo, $hi]")
    }
    // the quantile-free call keeps the original 6-column schema
    assert(Profile.approxProfile(df, Seq("n_chars")).columns.length === 6)
    // colliding derived names fail loud
    intercept[IllegalArgumentException] {
      Profile.approxProfile(df, Seq("n_chars"),
        quantiles = Seq(0.50001, 0.500001))
    }
  }

  test("approxProfile: exact columns identical to profile, estimate within rsd") {
    val df = graft.sources.Tables.documents(spark, sf0001)
    val cols = Seq("doc_id", "lang", "n_chars", "source")
    val exact = Profile.profile(df, cols)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val approx = Profile.approxProfile(df, cols, rsd = 0.05)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    for (c <- cols) {
      val e = exact(c); val a = approx(c)
      // n, n_null, min, max are EXACT on both faces
      assert((a._2, a._3, a._5, a._6) === ((e._2, e._3, e._5, e._6)), c)
      // n_distinct_est within the estimator's documented error (the
      // 5% rsd gives ~3-sigma headroom at these cardinalities)
      assert(math.abs(a._4 - e._4) <= math.max(1L, (e._4 * 0.05).toLong),
        s"$c: est ${a._4} vs exact ${e._4}")
    }
  }
}
