package graft

import graft.operators.AsOfJoin

/** Point-in-time as-of join: inclusive boundary, tie-breaks, missing
  * history, and the one-shuffle union-tag plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // right: key 1 has two writers at t=5 (tb 1 and 2) and one at t=8;
  // key 2 only has a FUTURE row (t=9).
  lazy val left = Seq(
    (100L, 1L, 5L), (101L, 1L, 7L), (102L, 1L, 10L), (103L, 2L, 7L))
    .toDF("event_id", "k", "t")
  lazy val right = Seq(
    (1L, 5L, 11L, "A"), (1L, 5L, 12L, "B"), (1L, 8L, 13L, "C"),
    (2L, 9L, 14L, "D"))
    .toDF("rk", "rt", "ver", "feat")

  lazy val joined = AsOfJoin.asOf(left, right,
      leftKey = "k", rightKey = "rk", leftTime = "t", rightTime = "rt",
      rightVals = Seq("ver", "feat"), rightTieBreak = Seq("ver"))
    .collect().map(r => r.getAs[Long]("event_id") ->
      (Option(r.getAs[java.lang.Long]("ver")), r.getAs[String]("feat"))).toMap

  test("as-of is inclusive and same-timestamp ties pick the greatest tiebreak") {
    // event at t=5 sees the t=5 writes; B (ver 12) wins the tie
    assert(joined(100L) === ((Some(12L), "B")))
  }

  test("each event sees the latest preceding version, never a future one") {
    assert(joined(101L) === ((Some(12L), "B")))  // t=7: still the t=5 state
    assert(joined(102L) === ((Some(13L), "C")))  // t=10: the t=8 write
    assert(joined(103L) === ((None, null)))      // key 2's only row is at t=9
  }

  test("nearest: direction, distance ties, tolerance, and no-match null") {
    // key 1: event at t=10 sits between writes at 6 (ver 21) and 13
    //   (ver 22) — forward is nearer (3 < 4)
    // key 2: event at t=10 equidistant from 8 and 12 — backward wins
    // key 3: event with only a far-future write — tolerance excludes it
    // key 4: only a future write, within tolerance — forward match
    val l = Seq((1L, 1L, 10L), (2L, 2L, 10L), (3L, 3L, 10L), (4L, 4L, 10L))
      .toDF("event_id", "k", "t")
    val r = Seq(
      (1L, 6L, 21L), (1L, 13L, 22L),
      (2L, 8L, 31L), (2L, 12L, 32L),
      (3L, 1000L, 41L),
      (4L, 12L, 51L))
      .toDF("rk", "rt", "ver")
    val got = AsOfJoin.asOfNearest(l, r, "k", "rk", "t", "rt",
        Seq("ver"), Seq("ver"), toleranceSec = Some(5.0))
      .collect().map(x => x.getAs[Long]("event_id") ->
        Option(x.getAs[java.lang.Long]("ver"))).toMap
    assert(got(1L) === Some(22L)) // |13-10|=3 beats |10-6|=4
    assert(got(2L) === Some(31L)) // tie |2| — backward preferred
    assert(got(3L) === None)      // 990s away, tolerance 5s
    assert(got(4L) === Some(51L)) // forward-only within tolerance
  }

  test("nearest on TIMESTAMP_NTZ times equals the numeric-time result") {
    // the driver fixture's events.ts arrives as TIMESTAMP_NTZ, which
    // refuses a direct DOUBLE cast — the distance math must route it
    // through TIMESTAMP (UTC session) and produce identical picks
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val l = Seq((1L, 1L, 10L), (2L, 2L, 10L), (3L, 3L, 10L), (4L, 4L, 10L))
      .toDF("event_id", "k", "t")
    val r = Seq(
      (1L, 6L, 21L), (1L, 13L, 22L),
      (2L, 8L, 31L), (2L, 12L, 32L),
      (3L, 1000L, 41L),
      (4L, 12L, 51L))
      .toDF("rk", "rt", "ver")
    val lNtz = l.withColumn("t",
      timestamp_seconds(col("t")).cast("timestamp_ntz"))
    val rNtz = r.withColumn("rt",
      timestamp_seconds(col("rt")).cast("timestamp_ntz"))
    assert(lNtz.schema("t").dataType ===
      org.apache.spark.sql.types.TimestampNTZType, "premise: ntz input")
    val got = AsOfJoin.asOfNearest(lNtz, rNtz, "k", "rk", "t", "rt",
        Seq("ver"), Seq("ver"), toleranceSec = Some(5.0))
      .collect().map(x => x.getAs[Long]("event_id") ->
        Option(x.getAs[java.lang.Long]("ver"))).toMap
    assert(got === Map(1L -> Some(22L), 2L -> Some(31L), 3L -> None, 4L -> Some(51L)))
    // bucketed variant shares toSec: same picks through the asOf path
    val gotB = AsOfJoin.asOfBucketed(lNtz, rNtz, "k", "rk", "t", "rt",
        Seq("ver"), Seq("ver"), bucketSeconds = 4L)
      .collect().map(x => x.getAs[Long]("event_id") ->
        Option(x.getAs[java.lang.Long]("ver"))).toMap
    val gotPlain = AsOfJoin.asOf(lNtz, rNtz, "k", "rk", "t", "rt",
        Seq("ver"), Seq("ver"))
      .collect().map(x => x.getAs[Long]("event_id") ->
        Option(x.getAs[java.lang.Long]("ver"))).toMap
    assert(gotB === gotPlain)
  }

  test("nearest: both direction fills share one exchange and one sort") {
    val df = AsOfJoin.asOfNearest(left, right, "k", "rk", "t", "rt",
      Seq("ver", "feat"), Seq("ver"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one shuffle:\n$plan")
    assert(sorts === 1, s"expected the two window frames to share one sort:\n$plan")
  }

  test("a genuinely-null right value is returned as null, never backfilled from an older row") {
    // key 1 history: (t=1, ver=7, feat="X") then (t=5, ver=9, feat=null).
    // The t=6 event matches the t=5 row — ALL of it, including its null
    // feat. Column-wise fills would leak "X" from the older row.
    val l = Seq((100L, 1L, 6L)).toDF("event_id", "k", "t")
    val r = Seq((1L, 1L, 7L, "X"), (1L, 5L, 9L, null.asInstanceOf[String]))
      .toDF("rk", "rt", "ver", "feat")
    val row = AsOfJoin.asOf(l, r, "k", "rk", "t", "rt",
      Seq("ver", "feat"), Seq("ver")).collect().head
    assert(row.getAs[Long]("ver") === 9L)
    assert(row.getAs[String]("feat") === null)
    val near = AsOfJoin.asOfNearest(l, r, "k", "rk", "t", "rt",
      Seq("ver", "feat"), Seq("ver")).collect().head
    assert(near.getAs[Long]("ver") === 9L)
    assert(near.getAs[String]("feat") === null)
  }

  test("right rows with null time are not history: no phantom matches") {
    val l = Seq((100L, 2L, 7L)).toDF("event_id", "k", "t")
    val r = Seq((2L, null.asInstanceOf[java.lang.Long], 42L))
      .toDF("rk", "rt", "ver")
    val row = AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", Seq("ver"), Seq("ver"))
      .collect().head
    assert(Option(row.getAs[java.lang.Long]("ver")) === None)
    val near = AsOfJoin.asOfNearest(l, r, "k", "rk", "t", "rt", Seq("ver"), Seq("ver"))
      .collect().head
    assert(Option(near.getAs[java.lang.Long]("ver")) === None)
  }

  test("streaming enrichment equals the batch as-of, any batching") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_stream").toString
    val rows = Seq((100L, 1L, 5L), (101L, 1L, 7L), (102L, 1L, 10L), (103L, 2L, 7L))
    def write(rs: Seq[(Long, Long, Long)]) =
      rs.toDF("event_id", "k", "t").repartition(1).write.mode("append").parquet(dir)
    write(rows.take(1))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long])]()
    val q = AsOfJoin.asOfStream(stream, right, "k", "rk", "t", "rt",
        Seq("ver", "feat"), Seq("ver"),
        (out, _) => out.collect().foreach(r => got.add(
          r.getAs[Long]("event_id") -> Option(r.getAs[java.lang.Long]("ver")).map(_.toLong))))
      .start()
    q.processAllAvailable()
    write(rows.slice(1, 3)); q.processAllAvailable()
    write(rows.drop(3)); q.processAllAvailable()
    q.stop()
    val streamed = got.toArray(Array.empty[(Long, Option[Long])]).toMap
    val batch = AsOfJoin.asOf(rows.toDF("event_id", "k", "t"), right,
        "k", "rk", "t", "rt", Seq("ver", "feat"), Seq("ver"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("ver")).map(_.toLong)).toMap
    assert(streamed === batch)
    assert(streamed.size === 4)
  }

  test("plan: one exchange, no join node (union-tag merge)") {
    val df = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
      Seq("ver", "feat"), Seq("ver"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("NestedLoop"), s"as-of must not plan a join node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one shuffle:\n$plan")
  }

  // ---- RangeJoin (binned point-in-interval) ----

  test("range join: boundary semantics, multi-bin spans, empty intervals, key separation") {
    import graft.operators.RangeJoin
    val pts = Seq((1L, 100L, 10L), (1L, 101L, 19L), (1L, 102L, 20L),
      (1L, 103L, 35L), (2L, 104L, 12L))
      .toDF("k", "pid", "p")
    val iv = Seq((1L, 900L, 10L, 20L),   // [10,20): spans bins 1..1 at w=10
      (1L, 901L, 5L, 36L),               // spans bins 0..3 — multi-bin
      (1L, 902L, 7L, 7L),                // empty → matches nothing
      (2L, 903L, 10L, 20L))              // other key
      .toDF("k", "ivid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, iv, "p", "s", "e",
        binWidth = 10L, equiKeys = Seq("k"))
      .select($"ivid", $"pid").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (900L, 100L), (900L, 101L),            // 10 in, 19 in, 20 OUT (end-exclusive)
      (901L, 100L), (901L, 101L), (901L, 102L), (901L, 103L), // 35 < 36
      (903L, 104L)))                          // key 2 only sees its own interval
    // exactness vs the naive theta join on a seeded random instance
    val rpts = spark.range(500).selectExpr("id % 7 AS k", "id AS pid",
      "CAST((id * 2654435761) % 1000 AS LONG) AS p")
    val riv = spark.range(120).selectExpr("id % 7 AS k", "id AS ivid",
      "CAST((id * 40503) % 900 AS LONG) AS s",
      "CAST((id * 40503) % 900 + (id % 50) AS LONG) AS e")
    val binned = RangeJoin.pointInInterval(rpts, riv, "p", "s", "e",
        binWidth = 37L, equiKeys = Seq("k"))
      .select($"ivid", $"pid").as[(Long, Long)].collect().toSet
    val naive = rpts.join(riv, "k")
      .filter($"p" >= $"s" && $"p" < $"e")
      .select($"ivid", $"pid").as[(Long, Long)].collect().toSet
    assert(binned === naive)
  }

  test("interval overlap: canonical bin dedups multi-bin overlaps; touching is not overlap") {
    import graft.operators.RangeJoin
    val a = Seq((1L, 10L, 5L, 45L),   // spans bins 0..4 at w=10
      (1L, 11L, 50L, 60L))
      .toDF("k", "aid", "s1", "e1")
    val b = Seq((1L, 20L, 15L, 44L),  // overlaps aid=10 across bins 1..4 → ONE row
      (1L, 21L, 45L, 50L),            // touches aid=10 at 45 (e1-exclusive) → none; touches 11 at 50 → none
      (1L, 22L, 58L, 90L))            // overlaps aid=11
      .toDF("k", "bid", "s2", "e2")
    val got = RangeJoin.intervalOverlap(a, b, "s1", "e1", "s2", "e2",
        binWidth = 10L, equiKeys = Seq("k"))
      .select($"aid", $"bid").as[(Long, Long)].collect().toList.sorted
    assert(got === List((10L, 20L), (11L, 22L)))
    // seeded replay vs the naive theta join
    val ra = spark.range(150).selectExpr("id % 5 AS k", "id AS aid",
      "CAST((id * 2654435761) % 800 AS LONG) AS s1",
      "CAST((id * 2654435761) % 800 + 1 + id % 60 AS LONG) AS e1")
    val rb = spark.range(150).selectExpr("id % 5 AS k", "id AS bid",
      "CAST((id * 40503) % 800 AS LONG) AS s2",
      "CAST((id * 40503) % 800 + 1 + id % 40 AS LONG) AS e2")
    val binnedPairs = RangeJoin.intervalOverlap(ra, rb, "s1", "e1", "s2", "e2",
        binWidth = 23L, equiKeys = Seq("k"))
      .select($"aid", $"bid").as[(Long, Long)].collect()
    val naive = ra.join(rb, "k")
      .filter($"s1" < $"e2" && $"s2" < $"e1")
      .select($"aid", $"bid").as[(Long, Long)].collect()
    assert(binnedPairs.length === binnedPairs.toSet.size, "duplicated pair")
    assert(binnedPairs.toSet === naive.toSet)
  }

  test("range join plans an equi-join, never a nested loop") {
    import graft.operators.RangeJoin
    val pts = spark.range(100).selectExpr("id % 5 AS k", "id AS pid", "id AS p")
    val iv = spark.range(20).selectExpr("id % 5 AS k", "id AS ivid",
      "id * 3 AS s", "id * 3 + 10 AS e")
    val plan = RangeJoin.pointInInterval(pts, iv, "p", "s", "e",
      binWidth = 10L, equiKeys = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"binned range join must be an equi-join:\n$plan")
  }
}
