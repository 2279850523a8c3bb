package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span-corruption batch prep (the T5 denoising objective, Raffel et
  * al. 2020): select spans of the token stream to mask, so the model
  * trains to reconstruct them. Production pipelines draw spans from an
  * RNG; here span selection is a PURE FUNCTION of (doc_id, pos) via
  * the repo's portable Knuth arithmetic — the q47/q49 determinism
  * stance applied to noise: the same corpus yields the same corruption
  * at any parallelism, on any engine, with no RNG state to checkpoint,
  * and the DuckDB oracle replays the selection exactly.
  *
  * Selection rule: position p of doc d STARTS a span iff
  * `knuth((d % 999983)·127 + p) % 100 < startPct`; the span covers
  * `minLen + knuth(...) % lenMod` tokens (T5's mean-3 spans ↔ the
  * default 2..4). Overlapping spans merge — the reported span count is
  * the count of maximal masked runs, the number of sentinel tokens a
  * T5 encoder input would carry.
  *
  * Shape: one narrow hash projection over the (id, pos, token) stream,
  * a ≤(minLen+lenMod)-wide explode of span starts, distinct + id-keyed
  * joins — partial-aggregated counts per doc, no windows, nothing
  * corpus-sized on the driver. The pre-reduction keeps every product
  * within BIGINT exactly (mix < 1.3e8 + pos before the prime mod). */
object SpanCorruption {

  /** The portable position hash: knuth((id % 999983)·127 + pos). */
  private def posHash(id: Column, pos: Column): Column =
    pmod(pmod(pmod(id, lit(999983L)) * 127 + pos, lit(1000003L))
      * lit(2654435761L), lit(4294967296L))

  /** Per-document corruption summary over a scalar (idCol, posCol,
    * tokCol) token stream: total tokens, masked tokens, merged span
    * count, and a position-weighted checksum of the KEPT (unmasked)
    * ids — the exact-integer witness that the surviving encoder input
    * is the right one. */
  def summarize(ids: DataFrame, idCol: String = "doc_id",
      posCol: String = "pos", tokCol: String = "token_id",
      startPct: Int = 5, minLen: Int = 2, lenMod: Int = 3): DataFrame = {
    require(startPct >= 0 && startPct <= 100, s"startPct=$startPct")
    require(minLen >= 1 && lenMod >= 1, s"minLen=$minLen lenMod=$lenMod")
    val id = col(idCol); val pos = col(posCol)
    val stream = ids.select(id, pos, col(tokCol))
    val hh = posHash(id, pos)
    val starts = stream
      .withColumn("__hh", hh)
      .filter(pmod(col("__hh"), lit(100)) < startPct)
      .select(id, pos, (lit(minLen) + pmod(col("__hh"), lit(lenMod))).as("__len"))
    // span covers explode (bounded fan-out), deduped; the join back to
    // the stream caps spans at each document's end
    val cover = starts
      .select(id, explode(sequence(pos, pos + col("__len") - 1)).as("__mpos"))
      .distinct()
    val masked = stream.select(id, pos)
      .join(cover.withColumnRenamed("__mpos", posCol), Seq(idCol, posCol),
        "left_semi")
    // a maximal run's head is a masked position whose predecessor isn't
    val heads = masked.join(
      masked.select(id, (pos + 1).as(posCol)), Seq(idCol, posCol), "left_anti")
    val kept = stream.join(masked, Seq(idCol, posCol), "left_anti")
    stream.groupBy(id).agg(count(lit(1)).as("n_tokens"))
      .join(masked.groupBy(id).agg(count(lit(1)).as("n_masked")), Seq(idCol), "left")
      .join(heads.groupBy(id).agg(count(lit(1)).as("n_spans")), Seq(idCol), "left")
      .join(kept.groupBy(id).agg(
        sum((pos + 1) * col(tokCol)).as("kept_checksum")), Seq(idCol), "left")
      .select(id,
        col("n_tokens"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("kept_checksum"), lit(0L)).as("kept_checksum"))
  }
}
