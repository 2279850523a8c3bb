package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanCorruption

/** Span corruption: distributed summary equals an independent local
  * replay of the selection rule; edge percentages behave. */
class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  // a small deterministic token stream: 6 docs × 40 positions
  private def stream() = (for {
    d <- 0L until 6L
    p <- 0L until 40L
  } yield (d, p, (d * 7 + p * 3) % 50)).toDF("doc_id", "pos", "token_id")

  private def knuth(mix: Long): Long =
    mix % 1000003L * 2654435761L % 4294967296L

  test("summary equals a local replay of the hash rule (merged spans, checksums)") {
    val got = SpanCorruption.summarize(stream())
      .orderBy($"doc_id").collect()
    val rows = stream().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, rs) =>
      val n = rs.length
      val maskedPos = scala.collection.mutable.Set.empty[Long]
      rs.foreach { case (_, p, _) =>
        val hh = knuth((d % 999983L) * 127 + p)
        if (hh % 100 < 5) {
          val len = 2 + hh % 3
          (p until math.min(p + len, n.toLong)).foreach(maskedPos += _)
        }
      }
      val spans = maskedPos.toSeq.sorted
        .count(p => !maskedPos.contains(p - 1))
      val kept = rs.filter { case (_, p, _) => !maskedPos(p) }
        .map { case (_, p, t) => (p + 1) * t }.sum
      (d, n.toLong, maskedPos.size.toLong, spans.toLong, kept)
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq === expected)
    // sanity: something was actually masked somewhere, nothing fully
    val totalMasked = expected.map(_._3).sum
    assert(totalMasked > 0 && totalMasked < expected.map(_._2).sum)
  }

  test("startPct edges: 0 masks nothing; 100 masks everything as one span") {
    val none = SpanCorruption.summarize(stream(), startPct = 0)
      .agg(sum($"n_masked"), sum($"n_spans")).head()
    assert(none.getLong(0) === 0L && none.getLong(1) === 0L)
    val all = SpanCorruption.summarize(stream(), startPct = 100)
      .select($"n_tokens" === $"n_masked", $"n_spans" === 1,
        $"kept_checksum" === 0).collect()
    assert(all.forall(r => r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2)))
  }
}
