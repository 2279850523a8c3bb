package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Near-duplicate admission at INGEST time — the streaming face of the
  * batch MinHash+LSH pipeline. A training-data pipeline doesn't dedup
  * once; it admits documents continuously, and each arriving document
  * must be checked against everything already seen WITHOUT rescanning
  * the corpus. This operator maintains a standing signature store (two
  * bucketed tables) and filters each micro-batch against it.
  *
  * Semantics (pinned, oracle-checkable): a document is ADMITTED iff no
  * earlier-seen document is a near-duplicate (n-gram Jaccard ≥
  * threshold). "Earlier" = any prior batch, or a smaller id within the
  * same batch; every seen document (admitted or not) joins the store,
  * so admission of d depends only on the set of documents before d —
  * NOT on which of them were themselves admitted. That makes the
  * result independent of how the stream is batched (any split of the
  * id-ordered stream yields the same admitted set), which is what lets
  * q87 carry a full DuckDB oracle: admitted = documents that appear as
  * the LATER side of no exact-Jaccard pair.
  *
  * Scale shape (the point of the standing store):
  *   - `<name>_bands` (band_id, band_key, id), bucketed AND sorted by
  *     band_key: the batch's band rows (batch_size×bands — micro by
  *     definition) are BROADCAST and the store streams past the hash
  *     probe in one narrow columnar scan — no shuffle of the store and
  *     no plan that grows with batch size (no collected literal key
  *     lists; see admitBatch for why In-literals were evicted).
  *   - `<name>_shingles` (id, sh), bucketed by id: exact-verify fetches
  *     shingle sets ONLY for the candidate old ids (broadcast
  *     semi-join), never scanning corpus text again.
  *   - The batch side is micro by definition: its signatures are
  *     computed once and broadcast into both probes.
  */
object IngestDedup {

  /** Drop the standing store (both tables), location-safely. */
  def initStore(spark: SparkSession, name: String): Unit = {
    graft.sources.Sinks.dropTable(spark, s"${name}_bands")
    graft.sources.Sinks.dropTable(spark, s"${name}_shingles")
  }

  /** Admit one micro-batch against the standing store `name`, append
    * the batch to the store, and return the admitted ids (one `id`
    * column). The returned frame is materialized BEFORE the store
    * append (a lazy plan would otherwise re-read the store after the
    * batch's own rows landed and self-reject every document at
    * jaccard 1.0). */
  def admitBatch(batch: DataFrame, name: String,
      idCol: String = "doc_id", textCol: String = "text",
      ngram: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, seed: Long = 42L,
      excludeIds: Option[DataFrame] = None,
      ver: Long = 0L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = batch.sparkSession
    // one signature/shingle pass over the micro-batch, pinned so every
    // consumer below reuses the arrays instead of re-hashing the text
    val b = batch.select(
        col(idCol).cast("long").as("id"),
        TextDedup.shingleHashes(col(textCol), ngram).as("sh"),
        TextDedup.minhashSignature(
          TextDedup.shingleHashes(col(textCol), ngram), numHashes, seed).as("sig"))
      .localCheckpoint()
    val bandRows = b
      .select(col("id"),
        explode(TextDedup.lshBands(col("sig"), bands, numHashes / bands)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_key"))
    // in-batch rejections: the batch is micro, so the batch-vs-batch
    // check is exactly the batch-mode pair pipeline on the batch alone
    // (any verified pair a<b rejects b)
    val rejInBatch = TextDedup.minhashPairs(batch, idCol, textCol,
        ngram, numHashes, bands, threshold, seed)
      .select(col("id_b").as("id")).distinct()
    // cross-batch rejections: probe the standing store. `excludeIds`
    // (a small frame, broadcast into an anti-join on the STORE side of
    // the candidate pairs) removes given old ids from rejection duty —
    // the upsert/takedown flows need it: a doc marked pending-removal
    // must stop rejecting lookalikes IMMEDIATELY (the Takedown story:
    // the store must forget, or a cleaned-up replacement can never be
    // re-admitted), even though its rows leave the store physically
    // only at the next compaction.
    val rejOld: DataFrame =
      if (!spark.catalog.tableExists(s"${name}_bands"))
        spark.emptyDataFrame.select(lit(0L).as("id")).limit(0)
      else crossBatchRejections(spark, name, bandRows, b, threshold, excludeIds)
    val admitted = b.select(col("id"))
      .join(rejInBatch, Seq("id"), "left_anti")
      .join(rejOld, Seq("id"), "left_anti")
      .localCheckpoint() // settle BEFORE the store grows (see scaladoc)
    appendToStore(spark, name, bandRows, b.select(col("id"), col("sh")), ver)
    admitted
  }

  /** Cross-batch probe: ids in the batch near-duplicating any stored
    * document. One broadcast-hash join against the store does the band
    * probing: the batch's (band_id, band_key) rows are micro
    * (batch×bands) and broadcast, so store rows stream past an
    * in-memory hash probe — no shuffle of the store and no plan that
    * grows with batch size. An earlier version collected the distinct
    * band keys to the driver and stuck them in an `isin(...)` literal
    * filter for row-group pruning; that made the PLAN grow with batch
    * size (a 100k-doc batch × 8 bands is an 800k-literal In —
    * analysis/codegen blowup), buying a pruning win that evaporates at
    * exactly the batch sizes where it matters (hash-uniform keys touch
    * every bucket and row group once the list is large). If per-batch
    * store scans ever dominate, the scale lever is partitioning the
    * store by a band_key prefix so dynamic partition pruning trims
    * files — not literal lists. PlanSpec pins the no-In-literal shape.
    * Package-private so the spec can inspect the LAZY plan (admitBatch
    * returns a checkpoint-settled frame whose lineage is gone). */
  /** Exclusion semantics (GENERATION-AWARE since round 9): `excludeIds`
    * carries (id[, ver_marked]) — a store row is off rejection duty iff
    * its id is excluded AND its generation is not newer than the mark
    * (`row.ver <= ver_marked`). A frame without a ver column excludes
    * every generation (the original takedown contract). This is what
    * lets a takedown's pending mark silence ONLY the dead content: a
    * later re-admission of the same id writes rows at a higher ver,
    * which keep rejecting lookalikes while the superseded generation
    * stays silenced until the physical sweep. */
  private[graft] def crossBatchRejections(spark: SparkSession, name: String,
      bandRows: DataFrame, b: DataFrame, threshold: Double,
      excludeIds: Option[DataFrame] = None): DataFrame = {
    // no broadcast HINT on the exclusion side: it is usually tiny (a
    // takedown batch) and AQE broadcasts it on its own, but its bound
    // is ratio×store (the pending-removal backlog right before a
    // sweep), where a forced broadcast would be the scale bug — the
    // id-keyed anti-join is the safe shape at both ends
    def unexcluded(storeSide: DataFrame): DataFrame =
      excludeIds.fold(storeSide) { ex0 =>
        val hasVer = ex0.columns.contains("ver_marked")
        val ex = (if (hasVer)
            ex0.select(col(ex0.columns.head).cast("long").as("__xid"),
              col("ver_marked").cast("long").as("__xver"))
          else ex0.select(col(ex0.columns.head).cast("long").as("__xid"),
            lit(Long.MaxValue).as("__xver"))).distinct()
        storeSide.join(ex,
          storeSide("id") === ex("__xid") && storeSide("ver") <= ex("__xver"),
          "left_anti")
      }
    // schema guard (the knnJoinStoreBq migration-hint discipline): a
    // signature store persisted before rows carried generations has no
    // `ver` column, and the generation-aware exclusion below would die
    // in an unresolved-column AnalysisException instead of a message
    // that names the fix
    for (t <- Seq(s"${name}_bands", s"${name}_shingles"))
      require(spark.table(t).columns.contains("ver"),
        s"$t predates generation-tagged signature rows (no `ver` column) " +
          "— rebuild the store via initStore + appendSignatures (or " +
          "compactSignatures) before gated ingestion")
    val store = unexcluded(spark.table(s"${name}_bands"))
    val cand = store
      .join(broadcast(bandRows.select(
        col("id").as("new_id"), col("band_id"), col("band_key"))),
        Seq("band_id", "band_key"))
      .select(col("id").as("old_id"), col("new_id")).distinct()
    // the shingle fetch must apply the SAME generation exclusion: a
    // candidate id with a dead older generation still has that
    // generation's sh rows in the table, and verifying against them
    // would resurrect the silenced content's rejections
    val oldSh = unexcluded(spark.table(s"${name}_shingles"))
      .join(broadcast(cand.select(col("old_id").as("id")).distinct()),
        Seq("id"), "left_semi")
    cand
      .join(oldSh.select(col("id").as("old_id"), col("sh").as("sh_old")),
        Seq("old_id"))
      .join(broadcast(b.select(col("id").as("new_id"), col("sh").as("sh_new"))),
        Seq("new_id"))
      .filter(TextDedup.jaccard(col("sh_old"), col("sh_new")) >= threshold)
      .select(col("new_id").as("id")).distinct()
  }

  /** Signature-store append WITHOUT the admission probe — what an
    * UPSERT flow needs for CHANGED docs: an edit to an already-present
    * doc is not a new admission decision, but its signatures must
    * refresh (old id goes on the pending-removal list, fresh content
    * signs in here). Same signature pipeline as [[admitBatch]], same
    * store layout. */
  private[graft] def appendSignatures(batch: DataFrame, name: String,
      idCol: String = "doc_id", textCol: String = "text",
      ngram: Int = 3, numHashes: Int = 32, bands: Int = 8,
      seed: Long = 42L, ver: Long = 0L): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = batch.sparkSession
    val b = batch.select(
        col(idCol).cast("long").as("id"),
        TextDedup.shingleHashes(col(textCol), ngram).as("sh"),
        TextDedup.minhashSignature(
          TextDedup.shingleHashes(col(textCol), ngram), numHashes, seed).as("sig"))
      .localCheckpoint()
    val bandRows = b
      .select(col("id"),
        explode(TextDedup.lshBands(col("sig"), bands, numHashes / bands)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_key"))
    appendToStore(spark, name, bandRows, b.select(col("id"), col("sh")), ver)
  }

  /** Append a batch's band rows and shingle sets to the store,
    * creating the bucketed tables on first use (stale-location-safe:
    * a leftover directory from a previous JVM is cleared, mirroring
    * Bm25.removeDocs). Appends to a bucketed table keep the bucket
    * spec, so the serving-side pruning survives growth. Every row
    * carries its writing batch's `ver` — the GENERATION tag the
    * takedown/re-admission flow keys on (see crossBatchRejections). */
  private def appendToStore(spark: SparkSession, name: String,
      bandRows: DataFrame, shingles: DataFrame, ver: Long): Unit = {
    if (!spark.catalog.tableExists(s"${name}_bands"))
      initStore(spark, name)
    // two disjoint table appends from the same settled batch — overlap
    // them (r14, guide §2.6)
    graft.util.Par.run(
      () => bandRows.withColumn("ver", lit(ver))
        .write.mode("append").format("parquet")
        .bucketBy(8, "band_key").sortBy("band_key")
        .saveAsTable(s"${name}_bands"),
      () => shingles.withColumn("ver", lit(ver))
        .write.mode("append").format("parquet")
        .bucketBy(8, "id")
        .saveAsTable(s"${name}_shingles"))
  }

  /** Remove documents from the standing signature store: lookalikes of
    * a removed document are admissible again (takedowns, licence
    * revocations, quality re-review — the signature store must forget,
    * or the corpus can never re-admit a cleaned-up replacement). This
    * completes the delete story across the three standing stores
    * (inverted index: Bm25.removeDocs; vector store:
    * DistributedAnnModel.remove; signature store: here).
    *
    * Physical rewrite, not a tombstone: both tables drop the ids via an
    * anti-join and rewrite with the SAME bucket spec (the Bm25
    * compactIndex pattern — localCheckpoint settles survivors before
    * the location-safe overwrite, since Spark cannot overwrite a table
    * its own plan is reading). Signature rows are small and the
    * rewrite preserves bucket pruning for every later probe; a
    * tombstone would instead tax every admission batch with an
    * anti-join forever. */
  def removeFromStore(spark: SparkSession, name: String, ids: DataFrame): Unit = {
    if (!spark.catalog.tableExists(s"${name}_bands")) return
    val gone = ids.select(col(ids.columns.head).cast("long").as("id")).distinct()
    // r14 (guide §2.6): the two settle+rewrite chains touch disjoint
    // tables and read-only inputs — run them concurrently instead of
    // paying four fixed job latencies in sequence.
    graft.util.Par.run(
      () => graft.sources.Sinks.parquetBucketed(
        spark.table(s"${name}_bands")
          .join(gone, Seq("id"), "left_anti").localCheckpoint(),
        s"${name}_bands", 8, Seq("band_key"), Seq("band_key")),
      () => graft.sources.Sinks.parquetBucketed(
        spark.table(s"${name}_shingles")
          .join(gone, Seq("id"), "left_anti").localCheckpoint(),
        s"${name}_shingles", 8, Seq("id")))
  }

  /** Physical sweep of SUPERSEDED generations: drop rows whose
    * (id, ver) is at-or-below a pending mark, keeping any newer
    * generation the same id wrote after re-admission. Same
    * settle-then-rewrite/bucket-preserving discipline as
    * [[removeFromStore]]; `pending` carries (id, ver_marked). */
  private[graft] def removeSupersededFromStore(spark: SparkSession,
      name: String, pending: DataFrame): Unit = {
    if (!spark.catalog.tableExists(s"${name}_bands")) return
    val p = pending.select(col(pending.columns.head).cast("long").as("__xid"),
        col("ver_marked").cast("long").as("__xver")).distinct()
      .localCheckpoint()
    def sweep(df: DataFrame): DataFrame =
      df.join(p, df("id") === p("__xid") && df("ver") <= p("__xver"),
        "left_anti").localCheckpoint()
    // disjoint tables, settle-per-thread (r14, guide §2.6)
    graft.util.Par.run(
      () => graft.sources.Sinks.parquetBucketed(
        sweep(spark.table(s"${name}_bands")),
        s"${name}_bands", 8, Seq("band_key"), Seq("band_key")),
      () => graft.sources.Sinks.parquetBucketed(
        sweep(spark.table(s"${name}_shingles")),
        s"${name}_shingles", 8, Seq("id")))
  }

  /** Batch-mode replay: feed `docs` through [[admitBatch]] in
    * `nBatches` contiguous id ranges (ascending — the pinned arrival
    * order) and return every admitted id. This is the SAME code the
    * streaming wiring runs per micro-batch; q87 drives it so the
    * driver's oracle gate covers the ingest-admission path. */
  def replayInBatches(docs: DataFrame, name: String, nBatches: Int,
      idCol: String = "doc_id", textCol: String = "text",
      ngram: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    initStore(spark, name)
    val maxId = docs.agg(max(col(idCol))).head().getLong(0)
    val step = (maxId + nBatches) / nBatches // ceil((max+1)/n)
    (0 until nBatches).map { k =>
      admitBatch(
        docs.filter(col(idCol) >= k * step && col(idCol) < (k + 1) * step),
        name, idCol, textCol, ngram, numHashes, bands, threshold, seed)
    }.reduce(_.unionByName(_))
  }

  /** Streaming wiring: foreachBatch over a document stream, admitting
    * each micro-batch against the standing store and handing the
    * admitted ids to `sink`. Arrival order between batches is the
    * stream order; [[admitBatch]] pins smaller-id-first within one. */
  def ingestStream(docs: DataFrame, name: String,
      sink: (DataFrame, Long) => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      ngram: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, seed: Long = 42L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(admitBatch(batch, name, idCol, textCol,
          ngram, numHashes, bands, threshold, seed), batchId)
      }
}
