package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Takedown propagation — one entry point that purges an id list from
  * EVERY standing store a pipeline serves from, with a per-store audit
  * the caller can gate on. The scattered delete primitives exist
  * (`DistributedAnnModel.remove`, `Bm25.removeDocs` + `compactIndex`,
  * `IngestDedup.removeFromStore`); what a GDPR/takedown workflow needs
  * is the composition: one list in, every store clean, and PROOF —
  * residual-reference counts recomputed from the stores themselves,
  * not inferred from the inputs.
  *
  * Scale shape: the purge list is takedown-sized (broadcastable); each
  * store pays one anti-join + its own compaction discipline (marker-
  * guarded physical rewrite for BM25, checkpoint-settled bucket frame
  * for the forest, bucketed rewrite for the signature store). Audit
  * counts are store-sized aggregations, never a collect of store rows.
  */
object Takedown {

  /** Purge `ids` (single castable-to-long column) from the given
    * stores. Returns the post-purge ANN model (the forest is an
    * immutable frame, not a named table) and an audit frame
    * (store, n_before, n_after, clean): row counts for the forest
    * buckets, distinct indexed docs for BM25, signature rows for the
    * ingest store; `clean` = 1 iff a recount of references to purged
    * ids in the post-purge store is zero. */
  def purgeAll(
      spark: SparkSession,
      ids: DataFrame,
      ann: Option[graft.ann.DistributedAnnModel] = None,
      bm25Name: Option[String] = None,
      sigStoreName: Option[String] = None,
      idCol: String = "id",
      bm25Buckets: Int = 32)
      : (Option[graft.ann.DistributedAnnModel], DataFrame) = {
    import spark.implicits._
    // select by NAME when present; positional only for an unambiguous
    // single-column frame (the Bm25.removeDocs guard — a multi-column
    // frame like SnapshotDiff's (doc_id, status) output must never
    // silently purge its first column)
    val src =
      if (ids.columns.contains(idCol)) col(idCol)
      else {
        require(ids.columns.length == 1,
          s"purgeAll: ids has columns ${ids.columns.mkString(",")} — none named '$idCol'")
        col(ids.columns.head)
      }
    val idList = ids
      .select(src.cast("long").as("id")).distinct()
      .localCheckpoint() // takedown-sized; reused against every store
    val audit = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Int)]

    val newAnn = ann.map { m =>
      val before = m.corpusBuckets.count()
      val purged = m.remove(idList, "id").compact()
      val residual = purged.corpusBuckets
        .join(idList.select(col("id").as("neighbor_id")), Seq("neighbor_id"))
        .count()
      audit += (("ann_forest", before, purged.corpusBuckets.count(),
        if (residual == 0) 1 else 0))
      purged
    }

    bm25Name.foreach { name =>
      val before = spark.table(s"${name}_postings")
        .select(col("doc_id")).distinct().count()
      Bm25.removeDocs(spark, name, idList)
      Bm25.compactIndex(spark, name, buckets = bm25Buckets)
      val post = spark.table(s"${name}_postings")
      // the index is TWO doc-keyed tables: recount residual purged ids
      // in doclens too (doclens drives N/avgdl and hence every served
      // weight) — certifying only postings would bless a torn compact
      // that left purged doc lengths inflating the corpus stats
      val purgedDocs = idList.select(col("id").as("doc_id"))
      val residual = post.join(purgedDocs, Seq("doc_id")).count() +
        spark.table(s"${name}_doclens").join(purgedDocs, Seq("doc_id")).count()
      audit += (("bm25", before,
        post.select(col("doc_id")).distinct().count(),
        if (residual == 0) 1 else 0))
    }

    sigStoreName.foreach { name =>
      // the store is TWO tables (bands + shingles); the audit must
      // recount both — certifying only bands would bless a torn
      // removeFromStore that left shingle signatures behind
      def rows() = spark.table(s"${name}_bands").count() +
        spark.table(s"${name}_shingles").count()
      val before = rows()
      graft.streaming.IngestDedup.removeFromStore(spark, name, idList)
      val residual =
        spark.table(s"${name}_bands").join(idList, Seq("id")).count() +
          spark.table(s"${name}_shingles").join(idList, Seq("id")).count()
      audit += (("ingest_sigs", before, rows(),
        if (residual == 0) 1 else 0))
    }

    (newAnn, audit.toSeq.toDF("store", "n_before", "n_after", "clean"))
  }
}
