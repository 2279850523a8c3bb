package graft

import org.apache.spark.sql.functions._
import graft.operators.EpochShuffle
import graft.sources.Tables

class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001).cache()

  test("schedule: each epoch is a complete permutation, positions 1..n") {
    val n = docs.count()
    val sched = EpochShuffle.schedule(docs, numEpochs = 3).cache()
    assert(sched.count() === 3 * n)
    val per = sched.groupBy("epoch").agg(
      count_distinct(col("doc_id")).as("ids"),
      min(col("position")).as("lo"), max(col("position")).as("hi"),
      count_distinct(col("position")).as("ps"))
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(per.length === 3)
    per.foreach { case (_, ids, lo, hi, ps) =>
      assert(ids === n && lo === 1L && hi === n && ps === n)
    }
  }

  test("epochs are decorrelated: epoch 0 and 1 orders differ") {
    val sched = EpochShuffle.schedule(docs, numEpochs = 2)
    val same = sched.filter($"epoch" === 0).as("a")
      .join(sched.filter($"epoch" === 1).as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.position" === $"b.position")
      .count()
    // a few fixed points are expected in a random permutation pair;
    // identical orders would make this n
    assert(same < docs.count() / 10)
  }

  test("deterministic: two schedules are identical (no RNG state)") {
    val a = EpochShuffle.schedule(docs, 2)
      .select("epoch", "position", "doc_id").as[(Int, Long, Long)].collect().toSet
    val b = EpochShuffle.schedule(docs, 2)
      .select("epoch", "position", "doc_id").as[(Int, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("resumeFrom: exact suffix, no replay, no loss") {
    val n = docs.count()
    val sched = EpochShuffle.schedule(docs, numEpochs = 2).cache()
    val resumed = EpochShuffle.resumeFrom(sched, epoch = 0, position = n - 10)
    assert(resumed.count() === 10 + n)
    val head = resumed.limit(1).select("epoch", "position")
      .as[(Int, Long)].head()
    assert(head === ((0, n - 9)))
    // the resumed suffix is exactly the schedule's suffix, in order
    val expect = sched.filter($"epoch" === 1 || $"position" > n - 10)
      .select("epoch", "position", "doc_id").as[(Int, Long, Long)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    val got = resumed.select("epoch", "position", "doc_id")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got === expect)
  }
}
