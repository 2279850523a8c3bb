package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies all four statuses; null contents compare null-safely") {
    val old = Seq(
      (1L, Some("a")), // unchanged
      (2L, Some("b")), // changed
      (3L, Some("c")), // removed
      (4L, None: Option[String]), // null vs null → unchanged
      (5L, None: Option[String])) // null vs value → changed
      .toDF("id", "text")
    val neu = Seq(
      (1L, Some("a")),
      (2L, Some("B")),
      (4L, None: Option[String]),
      (5L, Some("now set")),
      (6L, Some("fresh"))) // added
      .toDF("id", "text")
    val got = SnapshotDiff.diff(old, neu, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))
  }

  test("multi-column content: any column difference flips to changed") {
    val old = Seq((1L, "t", "en")).toDF("id", "text", "lang")
    val neu = Seq((1L, "t", "fr")).toDF("id", "text", "lang")
    val one = SnapshotDiff.diff(old, neu, "id", Seq("text", "lang")).head()
    assert(one.getString(1) === "changed")
    val sameTextOnly = SnapshotDiff.diff(old, neu, "id", Seq("text")).head()
    assert(sameTextOnly.getString(1) === "unchanged")
  }

  test("summary counts match the diff; single id-keyed shuffle in the diff plan") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val old = docs.filter(pmod($"doc_id", lit(7)) =!= 0)
    val neu = docs.filter(pmod($"doc_id", lit(11)) =!= 0)
      .withColumn("text", when(pmod($"doc_id", lit(5)) === 0,
        concat($"text", lit(" v2"))).otherwise($"text"))
    val d = SnapshotDiff.diff(old, neu, "doc_id", Seq("text"))
    val byStatus = d.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sm = SnapshotDiff.summary(old, neu, "doc_id", Seq("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sm === byStatus)
    assert(byStatus.keySet === Set("added", "removed", "changed", "unchanged"))
    // the reprocessing delta is what the operator exists to bound
    assert(byStatus("unchanged") > byStatus("changed"))
    // plan: the diff itself is one join; no exchange beyond the two
    // id-keyed scans feeding it (SortMergeJoin on doc_id)
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), "full-outer join missing from plan")
  }
}
