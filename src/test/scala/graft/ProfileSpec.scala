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
