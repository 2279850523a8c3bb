package graft

import org.apache.spark.sql.functions._
import graft.operators.Curriculum
import graft.sources.Tables

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001).cache()

  test("phases: every doc appears once, tile sizes are ntile-balanced") {
    val out = Curriculum.phases(docs, numPhases = 4).cache()
    val n = docs.count()
    assert(out.count() === n)
    assert(out.select(count_distinct(col("doc_id"))).head().getLong(0) === n)
    val sizes = out.groupBy("phase").count().orderBy("phase")
      .as[(Int, Long)].collect()
    assert(sizes.map(_._1).toSeq === (1 to 4))
    // ntile: first n%k tiles get one extra row
    val q = n / 4; val r = (n % 4).toInt
    sizes.foreach { case (p, c) => assert(c === (if (p <= r) q + 1 else q)) }
    // rank_in_phase is a contiguous 1..size sequence per phase
    val ranks = out.groupBy("phase").agg(
      min(col("rank_in_phase")).as("lo"), max(col("rank_in_phase")).as("hi"),
      count(lit(1)).as("c")).as[(Int, Int, Int, Long)].collect()
    ranks.foreach { case (_, lo, hi, c) => assert(lo === 1 && hi.toLong === c) }
  }

  test("phases are difficulty-monotone: phase p's max <= phase p+1's min") {
    val out = Curriculum.phases(docs, numPhases = 4)
    val bounds = out.groupBy("phase")
      .agg(min(struct(col("difficulty"), col("doc_id"))).as("lo"),
        max(struct(col("difficulty"), col("doc_id"))).as("hi"))
      .orderBy("phase")
      .select(col("phase"), col("lo.difficulty").as("lo"), col("hi.difficulty").as("hi"))
      .as[(Int, Double, Double)].collect()
    bounds.sliding(2).foreach {
      case Array((_, _, hi), (_, lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }

  test("difficulty signals: hand-checked doc") {
    val one = Seq((1L, "the cat the cat runs")).toDF("doc_id", "text")
    val r = Curriculum.difficulty(one).head()
    assert(r.getAs[Long]("n_tok") === 5L)
    // chars: 3+3+3+3+4 = 16 → 3.2 mean; distinct {the,cat,runs} → ttr 0.6
    assert(math.abs(r.getAs[Double]("mean_wlen") - 3.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("ttr") - 0.6) < 1e-12)
    val expect = 0.5 * 3.2 + 3.0 * 0.4 + math.log(6.0)
    assert(math.abs(r.getAs[Double]("difficulty") - expect) < 1e-12)
  }

  test("deterministic: two runs produce the identical order") {
    val a = Curriculum.phases(docs, 3).select("phase", "rank_in_phase", "doc_id")
      .as[(Int, Int, Long)].collect().toSet
    val b = Curriculum.phases(docs, 3).select("phase", "rank_in_phase", "doc_id")
      .as[(Int, Int, Long)].collect().toSet
    assert(a === b)
  }

  test("interleaved: read order rotates sources (sorted by (src_rank, source)), set preserved") {
    val out = Curriculum.interleaved(docs, numPhases = 3).cache()
    assert(out.count() === docs.count())
    assert(out.select(count_distinct(col("doc_id"))).head().getLong(0) === docs.count())
    // within each phase: read_pos is 1..size, and the order is exactly
    // (src_rank asc, source asc) — the rotation property
    val rows = out.select("phase", "read_pos", "src_rank", "source")
      .as[(Int, Int, Int, String)].collect()
      .groupBy(_._1).values
    rows.foreach { phaseRows =>
      val sorted = phaseRows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      val keys = sorted.map(r => (r._3, r._4)).toSeq
      assert(keys === keys.sorted, "read order must be (src_rank, source)")
    }
    // src_rank is contiguous per (phase, source)
    val perSrc = out.groupBy("phase", "source").agg(
      min(col("src_rank")).as("lo"), max(col("src_rank")).as("hi"),
      count(lit(1)).as("c")).as[(Int, String, Int, Int, Long)].collect()
    perSrc.foreach { case (_, _, lo, hi, c) => assert(lo === 1 && hi.toLong === c) }
  }

  test("numPhases > corpus: one row per phase, arithmetic stays ANSI-safe") {
    val tiny = docs.limit(3)
    val out = Curriculum.phases(tiny, numPhases = 7)
      .select("phase", "rank_in_phase").as[(Int, Int)].collect().sorted.toSeq
    assert(out === Seq((1, 1), (2, 1), (3, 1)))
  }
}
