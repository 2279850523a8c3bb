package graft

import graft.plans.RangeJoinRewrite

/** The SQL range-join rewrite rule (RangeJoinRewrite.scala): fires only
  * under its conf, rewrites every bound-shape variant exactly (the
  * dormant naive plan IS the oracle), skips joins it must not touch. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](w: Long)(body: => T): T = {
    RangeJoinRewrite.install(spark)
    spark.conf.set(RangeJoinRewrite.BIN_CONF, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.BIN_CONF)
  }

  /** Mixed-sign values (negative bins exercise double-floor vs
    * truncation), empty and REVERSED intervals (e < s — must match
    * nothing and must not feed `sequence` a descending range), nulls
    * on both sides. */
  private lazy val fixture: Unit = {
    val pts = (0 until 400).map { i =>
      (i.toLong, if (i % 50 == 49) None else Some((i * 37L % 997L) - 300L))
    }.toDF("pt_id", "p")
    val ivs = (0 until 120).map { i =>
      val s = (i * 61L % 733L) - 250L
      val span = (i % 7) match {
        case 0 => 0L      // empty interval
        case 1 => -40L    // reversed bounds
        case k => k * 25L // genuine span 50..150
      }
      val sOpt = if (i % 31 == 30) None else Some(s)
      (i + 10000L, sOpt, sOpt.map(_ + span))
    }.toDF("iv_id", "s", "e")
    pts.createOrReplaceTempView("rjr_pts")
    ivs.createOrReplaceTempView("rjr_ivs")
  }

  private val shapes = Seq(
    "p >= s AND p < e",  // the canonical end-exclusive containment
    "p > s AND p <= e",  // strict lower, inclusive upper
    "s <= p AND e > p",  // reversed orientations of both comparisons
    "p >= s AND p <= e") // BETWEEN expansion

  test("rewrite is exact for every bound shape (dormant plan is the oracle)") {
    fixture
    for (cond <- shapes) {
      val sql = s"SELECT pt_id, iv_id FROM rjr_pts JOIN rjr_ivs ON $cond"
      val naive = spark.sql(sql).as[(Long, Long)].collect().toSet
      val (got, plan) = withRule(16L) {
        val df = spark.sql(sql)
        (df.as[(Long, Long)].collect().toSet,
          df.queryExecution.executedPlan.toString)
      }
      assert(got === naive, s"shape: $cond")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), s"shape: $cond\n$plan")
      assert(plan.contains("__graft_bin"), s"rule did not fire: $cond\n$plan")
    }
  }

  test("comma-form FROM a, b WHERE … (a Cross join post-pushdown) also rewrites") {
    fixture
    val sql = "SELECT pt_id, iv_id FROM rjr_pts, rjr_ivs WHERE p >= s AND p < e"
    val naive = spark.sql(sql).as[(Long, Long)].collect().toSet
    val (got, plan) = withRule(16L) {
      val df = spark.sql(sql)
      (df.as[(Long, Long)].collect().toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(got === naive)
    assert(plan.contains("__graft_bin") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("NOT EXISTS range subquery (LeftAnti) rewrites — the decontamination-window shape") {
    fixture
    val sql = """SELECT pt_id FROM rjr_pts
                 WHERE NOT EXISTS (SELECT 1 FROM rjr_ivs
                                   WHERE p >= s AND p < e)"""
    val naive = spark.sql(sql).as[Long].collect().toSet
    val (got, plan) = withRule(16L) {
      val df = spark.sql(sql)
      (df.as[Long].collect().toSet, df.queryExecution.executedPlan.toString)
    }
    assert(got === naive)
    assert(plan.contains("__graft_bin") && !plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    // null points match nothing and must survive the anti join
    assert(naive.contains(49L), "null-p row must be kept by NOT EXISTS")
  }

  test("EXISTS range subquery (LeftSemi) rewrites and matches dormant") {
    fixture
    val sql = """SELECT pt_id FROM rjr_pts
                 WHERE EXISTS (SELECT 1 FROM rjr_ivs
                               WHERE p >= s AND p < e)"""
    val naive = spark.sql(sql).as[Long].collect().toSet
    val (got, plan) = withRule(16L) {
      val df = spark.sql(sql)
      (df.as[Long].collect().toSet, df.queryExecution.executedPlan.toString)
    }
    assert(got === naive)
    assert(plan.contains("__graft_bin"), plan)
  }

  test("semi with the INTERVAL side preserved stands down (explode would duplicate)") {
    fixture
    // intervals containing >=1 point: the preserved side would be the
    // exploded one — the rule must leave this to the nested loop
    val sql = """SELECT iv_id FROM rjr_ivs
                 WHERE EXISTS (SELECT 1 FROM rjr_pts
                               WHERE p >= s AND p < e)"""
    val naive = spark.sql(sql).as[Long].collect().toSet
    val (got, plan) = withRule(16L) {
      val df = spark.sql(sql)
      (df.as[Long].collect().toSet, df.queryExecution.executedPlan.toString)
    }
    assert(got === naive)
    assert(!plan.contains("__graft_bin"), plan)
  }

  test("dormant (conf unset) the naive join really is a nested loop") {
    fixture
    val plan = spark.sql(
      "SELECT pt_id, iv_id FROM rjr_pts JOIN rjr_ivs ON p >= s AND p < e")
      .queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("__graft_bin"), plan)
  }

  test("with a cross-side equi-conjunct the rule stands down (SMJ already fine)") {
    fixture
    val sql = """SELECT pt_id, iv_id FROM rjr_pts JOIN rjr_ivs
                 ON pt_id % 3 = iv_id % 3 AND p >= s AND p < e"""
    val naive = spark.sql(sql).as[(Long, Long)].collect().toSet
    val (got, plan) = withRule(16L) {
      val df = spark.sql(sql)
      (df.as[(Long, Long)].collect().toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(got === naive)
    assert(!plan.contains("__graft_bin"), plan)
  }

  test("non-integral range columns are left alone (double ⌊x/w⌋ not exact)") {
    val ptsD = Seq((1L, 3.5), (2L, 10.0)).toDF("pt_id", "pd")
    val ivsD = Seq((7L, 1.0, 4.0)).toDF("iv_id", "sd", "ed")
    ptsD.createOrReplaceTempView("rjr_pts_d")
    ivsD.createOrReplaceTempView("rjr_ivs_d")
    val sql = "SELECT pt_id, iv_id FROM rjr_pts_d JOIN rjr_ivs_d ON pd >= sd AND pd < ed"
    val (got, plan) = withRule(16L) {
      val df = spark.sql(sql)
      (df.as[(Long, Long)].collect().toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("__graft_bin"), plan)
    assert(got === Set((1L, 7L)))
  }

  test("rewrite matches the hand-written RangeJoin operator on the same inputs") {
    fixture
    val pts = spark.table("rjr_pts").filter($"p".isNotNull)
    val ivs = spark.table("rjr_ivs").filter($"s".isNotNull)
    val viaOp = graft.operators.RangeJoin.pointInInterval(
        pts, ivs, "p", "s", "e", binWidth = 16L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val viaRule = withRule(16L) {
      spark.sql("SELECT pt_id, iv_id FROM rjr_pts JOIN rjr_ivs ON p >= s AND p < e")
        .as[(Long, Long)].collect().toSet
    }
    assert(viaRule === viaOp)
  }

  test("GraftExtensions injects the rule (spark.sql.extensions contract)") {
    val rules = org.apache.spark.sql.GraftBridge.injectedOptimizerRules(
      new graft.plans.GraftExtensions, spark)
    assert(rules.contains(RangeJoinRewrite), rules.toString)
  }
}
