package graft

import org.apache.spark.sql.functions._
import graft.operators.WeightedSample
import graft.sources.Tables

/** Efraimidis-Spirakis weighted sampling: determinism, weight
  * monotonicity in the limit, the positive-weight guard, and the
  * heap-served plan shape. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic: two draws are identical") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars")
    val a = WeightedSample.perKey(docs, "lang", "doc_id", "n_chars", 5)
      .select($"lang", $"doc_id", $"rank").collect().map(_.toSeq).toSet
    val b = WeightedSample.perKey(docs, "lang", "doc_id", "n_chars", 5)
      .select($"lang", $"doc_id", $"rank").collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("k per key, ranks 1..k, all ids from the group") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars")
    val got = WeightedSample.perKey(docs, "lang", "doc_id", "n_chars", 3)
      .select($"lang", $"rank").as[(String, Int)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length))
      assert(rows.length <= 3)
    }
  }

  test("an overwhelming weight is always selected (u^(1/w) -> 1)") {
    // 50 light rows + 1 row whose weight dwarfs them: its priority is
    // within 1e-6 of 1.0 while E[max of 50 light priorities] stays
    // clearly below — the ES limit behavior, not a lucky seed.
    val df = ((1L to 50L).map(i => (i, "g", 10L)) :+ ((99L, "g", 100000000L)))
      .toDF("id", "grp", "w")
    val picked = WeightedSample.perKey(df, "grp", "id", "w", 5)
      .select($"id").as[Long].collect().toSet
    assert(picked.contains(99L))
  }

  test("non-positive weights fail loudly instead of silently reordering") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    // w = 0: ANSI division (1.0/w) raises before the guard can
    val zero = intercept[Exception] {
      WeightedSample.perKey(Seq((1L, "g", 5L), (2L, "g", 0L))
        .toDF("id", "grp", "w"), "grp", "id", "w", 2).collect()
    }
    assert(messages(zero).exists(_.contains("DIVIDE_BY_ZERO")))
    // w < 0: pow evaluates fine (and would rank WRONG) — the guard fires
    val neg = intercept[Exception] {
      WeightedSample.perKey(Seq((1L, "g", 5L), (2L, "g", -3L))
        .toDF("id", "grp", "w"), "grp", "id", "w", 2).collect()
    }
    assert(messages(neg).exists(_.contains("must be > 0")))
  }

  test("plan: heap prune present, no corpus-wide window sort before it") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars")
    val plan = WeightedSample.perKey(docs, "lang", "doc_id", "n_chars", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"heap prune missing:\n$plan")
  }

  /** Local replay of the tokenBudgetSample contract: per group, hash
    * order, maximal prefix with cumsum <= budget. */
  private def budgetTruth(rows: Seq[(String, Long, Long)],
      budgets: Map[String, Long]): Set[(String, Long)] = {
    def h(id: Long) =
      (id % 2147483647L) * 2654435761L % 2147483647L * 2147483629L +
        (id % 2147483629L) * 2246822519L % 2147483629L
    // .toSeq first: flatMap on the Map itself would re-collect the
    // (group, id) pairs INTO a Map and keep one doc per group
    rows.groupBy(_._1).toSeq.flatMap { case (g, docs) =>
      val b = budgets.getOrElse(g, 0L)
      var cum = 0L
      docs.sortBy(d => (h(d._2), d._2)).takeWhile { d =>
        cum += d._3; cum <= b
      }.map(d => (g, d._2))
    }.toSet
  }

  test("tokenBudgetSample == maximal hash-order prefix per group, at any bucket count") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (s"g${rnd.nextInt(4)}", i.toLong, 1L + rnd.nextInt(50)) }
    val docs = rows.toDF("lang", "doc_id", "tok")
    val budgets = Map("g0" -> 500L, "g1" -> 50L, "g2" -> 2000L, "g3" -> 0L)
    val truth = budgetTruth(rows, budgets)
    for (buckets <- Seq(1, 4, 256, 1024)) {
      val got = WeightedSample.tokenBudgetSample(
          docs, "lang", "doc_id", col("tok"), budgets, buckets)
        .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
      assert(got === truth, s"buckets=$buckets")
    }
    // budget respected exactly
    val kept = WeightedSample.tokenBudgetSample(
        docs, "lang", "doc_id", col("tok"), budgets, 256)
      .groupBy($"lang").agg(sum($"tokens").as("t"))
      .as[(String, Long)].collect().toMap
    kept.foreach { case (g, t) => assert(t <= budgets(g), g) }
  }

  test("tokenBudgetSample is prefix-monotone in the budget") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i => ("g", i.toLong, 1L + rnd.nextInt(30)) }
    val docs = rows.toDF("lang", "doc_id", "tok")
    def sample(b: Long) = WeightedSample.tokenBudgetSample(
        docs, "lang", "doc_id", col("tok"), Map("g" -> b), 64)
      .select($"doc_id").as[Long].collect().toSet
    val small = sample(300L)
    val big = sample(1200L)
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  // ---- SampleStore (standing per-group top-k) ----

  test("sample store: maintained across waves equals the one-shot batch sample") {
    import graft.operators.{SampleStore, WeightedSample}
    val docs = (1L to 90L).map(i => (s"g${i % 4}", i, 10L + i % 37))
      .toDF("grp", "doc_id", "w")
    SampleStore.initStore(docs.filter($"doc_id" <= 30), "wsstore_a",
      "grp", "doc_id", "w", k = 3)
    SampleStore.applyBatch(docs.filter($"doc_id" > 30 && $"doc_id" <= 60),
      "wsstore_a", "grp", "doc_id", "w", 1L)
    SampleStore.applyBatch(docs.filter($"doc_id" > 60), "wsstore_a",
      "grp", "doc_id", "w", 2L)
    val maintained = SampleStore.sample(spark, "wsstore_a")
      .select($"grp", $"id", $"rank").as[(String, Long, Int)].collect().toSet
    val oneShot = WeightedSample.perKey(
        docs.select($"grp", $"doc_id".as("id"), $"w"), "grp", "id", "w", 3)
      .select($"grp", $"id", $"rank").as[(String, Long, Int)].collect().toSet
    assert(maintained === oneShot)
    // re-delivered batch id: skipped, store unchanged
    assert(!SampleStore.applyBatch(docs.limit(5), "wsstore_a",
      "grp", "doc_id", "w", 1L))
    assert(SampleStore.sample(spark, "wsstore_a")
      .select($"grp", $"id", $"rank").as[(String, Long, Int)]
      .collect().toSet === maintained)
  }

  test("sample store: describeStore reports rows, groups, k, ledger") {
    import graft.operators.SampleStore
    val m = SampleStore.describeStore(spark, "wsstore_a").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_groups") === 4L && m("k") === 3L)
    assert(m("n_rows") === 12L, "4 groups x k=3")
    assert(m("applied_batches") === 2L)
  }

  test("sample store: duplicate ids merge by max weight (best claim wins)") {
    import graft.operators.SampleStore
    val a = Seq(("g", 1L, 5L), ("g", 2L, 50L)).toDF("grp", "doc_id", "w")
    SampleStore.initStore(a, "wsstore_dup", "grp", "doc_id", "w", k = 2)
    // id 1 re-arrives with a BIGGER weight: priority u^(1/w) grows
    // with w, so the merged store must rank id 1 by w=500
    SampleStore.applyBatch(Seq(("g", 1L, 500L)).toDF("grp", "doc_id", "w"),
      "wsstore_dup", "grp", "doc_id", "w", 1L)
    val got = SampleStore.sample(spark, "wsstore_dup")
      .select($"id", $"w").as[(Long, Long)].collect().toMap
    assert(got(1L) === 500L)
    assert(got.size === 2, "no duplicate rows for the re-delivered id")
  }
}
