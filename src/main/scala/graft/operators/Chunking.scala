package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the sequence-prep step between
  * tokenization and packing: split each document into token windows of
  * at most `window` tokens advancing by `stride` (overlap = window −
  * stride), the shape every pretraining dataloader ("split long docs
  * into max_seq_len pieces, keep some overlap so no boundary loses
  * context") and every RAG indexer ("chunk, embed each chunk") needs.
  *
  * Window placement contract (deterministic, engine-mirrorable):
  * starts at 0, stride, 2·stride, …; a document of n tokens yields
  *
  *   n_chunks = 1                            if n ≤ window
  *              1 + ⌈(n − window)/stride⌉    otherwise
  *
  * so the LAST chunk always reaches the end of the document (it may be
  * shorter than `window`) and no emitted chunk is a strict suffix of
  * its predecessor — the stop-after-covering-the-end convention.
  * Empty-token documents still emit their single (empty) chunk:
  * dropping rows is a filter decision that belongs to the caller, not
  * a side effect of chunking.
  *
  * Scale shape: one narrow projection + one explode — no shuffle, no
  * window function, no state; chunking parallelizes per input split at
  * any corpus size. The explode factor is ~n/stride rows per doc, the
  * same multiplicity the downstream embed/pack step must pay anyway.
  */
object Chunking {

  /** Token array of `text` under the repo-wide whitespace convention
    * (shared with [[TextAnalysis.tokens]] — one tokenizer, one truth). */
  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** Array of chunk texts for one document, re-joined by single
    * spaces: element k covers tokens [k·stride, k·stride + window). */
  def chunkTexts(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val t = toks(text)
    val n = size(t)
    val nChunks = when(n <= window, lit(1))
      .otherwise(lit(1) + ceil((n - window).cast("double") / stride).cast("int"))
    transform(sequence(lit(0), nChunks - 1),
      k => array_join(slice(t, k * stride + 1, lit(window)), " "))
  }

  /** One row per chunk: (id, chunk_id, n_tokens, chunk) — chunk_id is
    * the 0-based window index (chunk k starts at token k·stride),
    * n_tokens the chunk's own token count: window except the tail,
    * computed arithmetically from the doc length (tokens round-trip
    * through the single-space re-join bit-identically, so arithmetic
    * and re-tokenizing agree — the former skips a second split). */
  def chunk(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 64,
      stride: Int = 48): DataFrame =
    docs
      .select(col(idCol), size(toks(col(textCol))).as("__n"),
        posexplode(chunkTexts(col(textCol), window, stride))
          .as(Seq("chunk_id", "chunk")))
      .select(col(idCol), col("chunk_id"),
        least(lit(window), col("__n") - col("chunk_id") * stride)
          .as("n_tokens"),
        col("chunk"))
}
