package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactVectors keeps first occurrence (lowest id) per bit key") {
    val df = Seq(
      (0L, Array(1f, 2f)), (1L, Array(3f, 4f)),
      (2L, Array(1f, 2f)), (3L, Array(1f, 2f)), (4L, Array(-0.0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.exactVectors(df, "embedding", "vec_id")
      .select("vec_id").as[Long].collect().sorted
    assert(out === Array(0L, 1L, 4L))
  }

  test("row 0 is kept (divergence from reference drop-row-0 bug, src/lib.rs:71)") {
    val df = Seq((0L, Array(9f)), (1L, Array(8f))).toDF("vec_id", "embedding")
    assert(Dedup.exactVectors(df, "embedding", "vec_id").count() === 2)
  }

  test("-0.0 and 0.0 are NOT merged (bit-exact key)") {
    val df = Seq((0L, Array(0.0f)), (1L, Array(-0.0f))).toDF("vec_id", "embedding")
    assert(Dedup.exactVectors(df, "embedding", "vec_id").count() === 2)
  }

  test("dedup is idempotent") {
    val df = Seq(
      (0L, Array(1f)), (1L, Array(1f)), (2L, Array(2f))).toDF("vec_id", "embedding")
    val once = Dedup.exactVectors(df, "embedding", "vec_id")
    val twice = Dedup.exactVectors(once, "embedding", "vec_id")
    assert(once.collect().toSet === twice.collect().toSet)
  }
}
