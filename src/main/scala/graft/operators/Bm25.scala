package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword relevance — the lexical half of hybrid search.
  * A complete vector-search engine serves "vector OR keyword OR both"
  * (every production engine in the category does); this provides the
  * keyword leg over the same documents table, and SparkEntry's hybrid
  * query fuses it with the cosine leg by reciprocal-rank fusion.
  *
  * Scale shape: the query-term table is tiny and broadcast, so the
  * token explode is immediately pre-filtered to query terms — tf
  * aggregation and the df/idf side see only matching instances, not
  * the corpus vocabulary. Wide ops: one (doc, term) tf agg, one
  * per-term df agg over the already-tiny tf table, one per-doc dl join
  * (equi-join on the doc id; co-partitioned with tf's output), one
  * per-doc sum. Corpus stats (N, avgdl) are a 1-row aggregate crossed
  * into the plan — no driver action.
  */
object Bm25 {

  /** BM25 score of every matching document against a bag-of-terms
    * query (`terms`: any 1-column DataFrame; duplicates ignored).
    * Returns (idCol, n_matched, bm25) — bm25 UNROUNDED (callers round
    * for display / hashing; ranking wants full precision). Uses the
    * Lucene-style always-positive idf: ln(1 + (N − df + ½)/(df + ½)).
    * Documents matching no term are absent (score 0 by convention). */
  def score(docs: DataFrame, terms: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val t = terms.select(col(terms.columns.head).as("term")).distinct()
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val dl = docs.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.join(broadcast(t), col("token") === col("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf has one row per (doc, term) ⇒ df per term is a plain count
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("w", weight(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"), k1, b))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("w")).as("bm25"))
  }

  /** Batch form — the realistic serving workload: `queries` holds
    * (query_id, term) rows for many bag-of-terms queries at once. The
    * corpus-side work (term-filtered tf, df, dl) is computed ONCE over
    * the union of all query terms and shared; fan-out to queries is a
    * broadcast join of the tiny (query_id, term) table at the end, and
    * the per-(query, doc) aggregation shuffles only matched hits.
    * Returns (query_id, idCol, n_matched, bm25 UNROUNDED). */
  def scoreBatch(docs: DataFrame, queries: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = queries.select(col("query_id"), col("term")).distinct()
    val allTerms = q.select(col("term")).distinct()
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val dl = docs.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // per-(doc, term) stats once for the term union — queries sharing a
    // term share the work
    val tf = toks.join(broadcast(allTerms), col("token") === col("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("w", weight(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"), k1, b))
      .join(broadcast(q), "term") // fan out hits to the queries wanting the term
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("w")).as("bm25"))
  }

  /** The BM25 term weight (one formula shared by both the ad-hoc and
    * the indexed path, so their scores agree exactly). */
  private def weight(tf: Column, df: Column, dl: Column,
      nDocs: Column, avgdl: Column, k1: Double, b: Double): Column =
    log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5))) *
      (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / avgdl))

  /** Build a STANDING inverted index for recurring queries — the
    * lexical analog of the routed ANN bucket table: pay the corpus
    * shuffle once at write, serve every later query from the layout.
    *
    * Four tables: `<name>_postings` (term, doc, tf, dl — dl
    * denormalized so query time needs no per-doc join), bucketed AND
    * sorted by term so a term-equality query reads only matching
    * buckets (bucket pruning: `SelectedBucketsCount` in the scan);
    * `<name>_terms` (term, df); `<name>_doclens` (doc, dl — the
    * per-doc lengths [[removeDocs]] needs to adjust corpus stats
    * exactly); `<name>_stats` (n_docs, sum_dl — the SUM, not the
    * average: an average can't be exactly decremented, the sum can). */
  def buildIndex(docs: DataFrame, name: String, buckets: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    // crash safety: a build-in-progress marker goes down FIRST, and
    // comes up only after the last table write succeeds. A crash at any
    // point between leaves the marker behind, and scoreIndexed /
    // compactIndex refuse a marked index outright — so a torn rebuild
    // can never serve mixed tables, and the stale-tombstone hazard
    // (old tombstones applied to fresh tables = silently wrong scores)
    // is closed without ordering games.
    setBuilding(spark, name, on = true)
    graft.sources.Sinks.dropTable(spark, s"${name}_tombstones")
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val dl = docs.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val postings = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, idCol)
    graft.sources.Sinks.parquetBucketed(
      postings, s"${name}_postings", buckets, Seq("term"), Seq("term"))
    graft.sources.Sinks.parquetBucketed(
      postings.groupBy(col("term")).agg(count(lit(1)).as("df")),
      s"${name}_terms", buckets, Seq("term"), Seq("term"))
    graft.sources.Sinks.parquetTable(dl, s"${name}_doclens")
    graft.sources.Sinks.parquetTable(
      dl.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl")),
      s"${name}_stats")
    setBuilding(spark, name, on = false)
  }

  /** The build-in-progress marker is a plain warehouse file, not a
    * catalog entry — it must survive the JVM and be visible to a fresh
    * catalog, exactly like the table directories it guards. */
  private def buildingMarker(spark: org.apache.spark.sql.SparkSession,
      name: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      name.toLowerCase(java.util.Locale.ROOT) + "__building")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def setBuilding(spark: org.apache.spark.sql.SparkSession,
      name: String, on: Boolean): Unit = {
    val (fs, p) = buildingMarker(spark, name)
    if (on) fs.create(p, true).close()
    else fs.delete(p, false)
  }

  /** Operational introspection of a standing index: (metric, value)
    * rows for the numbers a compaction policy reads — indexed vs
    * tombstoned vs live doc counts, vocabulary and postings size, and
    * the indexed token total. One declarative plan (a union of 1-row
    * aggregates over the index tables — no driver loop); every metric
    * mirrors exactly from the source corpus + delete schedule, so the
    * q105 driver row carries a full DuckDB oracle. The standard policy
    * trigger is n_docs_tombstoned / n_docs_indexed exceeding a
    * threshold → compactIndex. */
  def describeIndex(spark: org.apache.spark.sql.SparkSession,
      name: String, idCol: String = "doc_id"): DataFrame = {
    requireServable(spark, name)
    // same fail-fast as serving: an old-layout index should say how to
    // upgrade, not die mid-plan on an unresolved column
    require(spark.table(s"${name}_stats").columns.contains("sum_dl") &&
        spark.catalog.tableExists(s"${name}_doclens"),
      s"index '$name' predates the (sum_dl, doclens) layout — " +
        "rerun buildIndex to upgrade it")
    val doclens = spark.table(s"${name}_doclens")
    val tombRaw =
      if (spark.catalog.tableExists(s"${name}_tombstones"))
        spark.table(s"${name}_tombstones").select(col(idCol)).distinct()
      else doclens.select(col(idCol)).limit(0)
    // only tombstones the index actually HOLDS count: removeDocs of a
    // never-indexed id is a documented no-op, and counting it would
    // break live + tombstoned == indexed (and inflate the compaction
    // trigger with rewrites that would rewrite nothing)
    val tomb = tombRaw.join(doclens.select(col(idCol)), Seq(idCol), "left_semi")
    def one(metric: String, v: DataFrame): DataFrame =
      v.select(lit(metric).as("metric"), col(v.columns.head).cast("long").as("value"))
    one("n_docs_indexed", doclens.agg(count(lit(1))))
      .unionByName(one("n_docs_live",
        doclens.join(tomb, Seq(idCol), "left_anti").agg(count(lit(1)))))
      .unionByName(one("n_docs_tombstoned", tomb.agg(count(lit(1)))))
      .unionByName(one("n_postings",
        spark.table(s"${name}_postings").agg(count(lit(1)))))
      .unionByName(one("n_terms",
        spark.table(s"${name}_terms").agg(count(lit(1)))))
      .unionByName(one("sum_dl_indexed",
        spark.table(s"${name}_stats").select(col("sum_dl"))))
  }

  private def requireServable(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    val (fs, p) = buildingMarker(spark, name)
    require(!fs.exists(p),
      s"index '$name': a rebuild is in progress or was interrupted " +
        s"(marker $p present) — rerun buildIndex")
  }

  /** Delete documents from a standing index without a rebuild: appends
    * the ids to `<name>_tombstones`. [[scoreIndexed]] then serves as if
    * the docs were never indexed — postings anti-joined, per-term df
    * decremented by the tombstoned postings, and corpus stats (N,
    * avgdl) decremented EXACTLY from the persisted doc lengths (all
    * integer arithmetic until the single avgdl division, so
    * indexed-after-delete equals ad-hoc-on-remaining to the last bit
    * of every weight input — specced). Deleting an id the index never
    * held is a no-op. [[compactIndex]] makes deletions physical. */
  def removeDocs(spark: org.apache.spark.sql.SparkSession, name: String,
      ids: DataFrame, idCol: String = "doc_id"): Unit = {
    // select by NAME when present; positional only for an unambiguous
    // 1-column frame (a multi-column frame without idCol would silently
    // tombstone the wrong column's values)
    val src =
      if (ids.columns.contains(idCol)) col(idCol)
      else {
        require(ids.columns.length == 1,
          s"removeDocs: ids has columns ${ids.columns.mkString(",")} — none named '$idCol'")
        col(ids.columns.head)
      }
    // a fresh catalog over a stale warehouse: the first append would
    // CREATE the table and trip over the leftover directory — clear it
    if (!spark.catalog.tableExists(s"${name}_tombstones"))
      graft.sources.Sinks.dropTable(spark, s"${name}_tombstones")
    ids.select(src.cast("long").as(idCol)).distinct()
      .write.mode("append").format("parquet").saveAsTable(s"${name}_tombstones")
  }

  /** Incremental index maintenance: fold NEW documents into a standing
    * index without touching the standing postings — the other half of
    * the delete story ([[removeDocs]]/[[compactIndex]]), and what a
    * [[SnapshotDiff]] delta needs to keep an index current between
    * corpus drops (remove `removed ∪ changed`, compact, append
    * `added ∪ changed` — q146 proves the result serves bit-identically
    * to a fresh build over the new drop).
    *
    * Scale shape: the new docs' postings APPEND into the bucketed
    * postings table with the same bucket spec (Spark hash-aligns the
    * new files into the existing buckets — no rewrite, no shuffle of
    * standing rows); `terms` (df) and `stats` are then recomputed by
    * aggregation over INDEX-sized tables — the df of every term is a
    * count over postings rows, so incremental-then-recount equals
    * fresh-build exactly, integer for integer (avgdl's single division
    * included). Marker-guarded like every other multi-table mutation.
    *
    * Precondition: no pending tombstones and no id overlap with the
    * standing index (an upsert is remove → compact → append; silently
    * double-indexing an id would double its tf contributions). Both
    * checked loudly. */
  def appendDocs(spark: org.apache.spark.sql.SparkSession, name: String,
      docs: DataFrame, buckets: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    requireServable(spark, name)
    // Pending tombstones do NOT block an append of NEW ids (round 8 —
    // what a streaming maintenance loop needs to stay O(delta) per
    // batch): serving subtracts the tombstoned postings/doclens
    // contributions from the physical tables, and an append of
    // disjoint ids changes neither side of that subtraction — adjusted
    // df/N/avgdl stay exactly the live corpus's. What MUST compact
    // first is re-adding a TOMBSTONED id (its old rows are still
    // physical, so the serving anti-join would hide the new rows too);
    // the doclens overlap check below catches exactly that case,
    // because tombstoned ids stay in doclens until compactIndex.
    val dup = docs.select(col(idCol))
      .join(spark.table(s"${name}_doclens").select(col(idCol)), Seq(idCol))
      .count()
    require(dup == 0,
      s"appendDocs: $dup ids already physically indexed (live or " +
        "tombstoned) — removeDocs + compactIndex first")
    // the batch itself must be id-unique too: an upstream join fan-out
    // would otherwise double-index silently (doubled tf, inflated df,
    // double-counted doclens) with no error anywhere downstream
    val (nRows, nIds) = {
      val r = docs.agg(count(lit(1)), count_distinct(col(idCol))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(nRows == nIds,
      s"appendDocs: batch has $nRows rows over $nIds distinct ids — dedupe first")
    setBuilding(spark, name, on = true)
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val dl2 = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val p2 = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(dl2, idCol)
    val pCols = spark.table(s"${name}_postings").columns
    p2.select(pCols.toIndexedSeq.map(col): _*)
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_postings")
    val dCols = spark.table(s"${name}_doclens").columns
    dl2.select(dCols.toIndexedSeq.map(col): _*)
      .write.mode("append").format("parquet").saveAsTable(s"${name}_doclens")
    // Derived tables refresh from the DELTA, not the corpus: the per-
    // term df merge reads only the standing vocab-sized `_terms` plus
    // the batch's own (doc, term) rows, and the 1-row `_stats` gets the
    // batch's counts added — the standing postings/doclens tables are
    // never rescanned, so per-append cost stays flat as the index grows
    // (PlanSpec pins the no-postings-scan shape; ProbeBm25Append
    // measures the flatness). Delta-then-merge equals recount exactly:
    // df is additive over disjoint doc sets (the id-overlap require
    // above guarantees disjointness), and (n_docs, sum_dl) are plain
    // integer sums. localCheckpoint severs lineage so each table can
    // be overwritten while derived from its own previous contents
    // (same hazard compactIndex documents).
    val (mTerms, mStats) = appendMergePlans(spark, name, p2, dl2)
    val mergedTerms = mTerms.localCheckpoint()
    val mergedStats = mStats.localCheckpoint()
    graft.sources.Sinks.parquetBucketed(
      mergedTerms, s"${name}_terms", buckets, Seq("term"), Seq("term"))
    graft.sources.Sinks.parquetTable(mergedStats, s"${name}_stats")
    setBuilding(spark, name, on = false)
  }

  /** The [[appendDocs]] derived-table refresh plans, exposed so PlanSpec
    * can pin their scale shape: neither plan may scan the standing
    * `<name>_postings` (or `<name>_doclens`) table — the whole point of
    * the incremental path is that a delta append costs O(delta + vocab),
    * not O(corpus). `p2` is the batch's (doc, term, tf) rows, `dl2` the
    * batch's (doc, dl) rows, both delta-sized and already computed by
    * the caller. */
  private[graft] def appendMergePlans(
      spark: org.apache.spark.sql.SparkSession, name: String,
      p2: DataFrame, dl2: DataFrame): (DataFrame, DataFrame) = {
    val deltaDf = p2.groupBy(col("term")).agg(count(lit(1)).as("df_delta"))
    val mergedTerms = spark.table(s"${name}_terms")
      .join(deltaDf, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df_delta"), lit(0L)))
          .as("df"))
    val deltaStats = dl2.agg(count(lit(1)).as("n_docs_delta"),
      coalesce(sum(col("dl")), lit(0L)).as("sum_dl_delta"))
    val mergedStats = spark.table(s"${name}_stats")
      .crossJoin(broadcast(deltaStats))
      .select((col("n_docs") + col("n_docs_delta")).as("n_docs"),
        (col("sum_dl") + col("sum_dl_delta")).as("sum_dl"))
    (mergedTerms, mergedStats)
  }

  /** Physical compaction: rewrite the index minus the tombstoned docs
    * (postings/terms/doclens/stats all recomputed from the surviving
    * rows) and drop the tombstone table. Serving cost returns to the
    * tombstone-free path; scores are unchanged (same surviving
    * inputs). localCheckpoint severs lineage so each table can be
    * overwritten while derived from its own previous contents. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, name: String,
      buckets: Int = 32, idCol: String = "doc_id"): Unit = {
    requireServable(spark, name)
    if (!spark.catalog.tableExists(s"${name}_tombstones")) return
    val tomb = spark.table(s"${name}_tombstones").select(col(idCol)).distinct()
    // the rewrite is a build: marker down while the tables are torn
    setBuilding(spark, name, on = true)
    val postings = spark.table(s"${name}_postings")
      .join(tomb, Seq(idCol), "left_anti").localCheckpoint()
    val doclens = spark.table(s"${name}_doclens")
      .join(tomb, Seq(idCol), "left_anti").localCheckpoint()
    graft.sources.Sinks.parquetBucketed(
      postings, s"${name}_postings", buckets, Seq("term"), Seq("term"))
    graft.sources.Sinks.parquetBucketed(
      postings.groupBy(col("term")).agg(count(lit(1)).as("df")),
      s"${name}_terms", buckets, Seq("term"), Seq("term"))
    graft.sources.Sinks.parquetTable(doclens, s"${name}_doclens")
    graft.sources.Sinks.parquetTable(
      doclens.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl")),
      s"${name}_stats")
    graft.sources.Sinks.dropTable(spark, s"${name}_tombstones")
    setBuilding(spark, name, on = false)
  }

  /** Score a bag-of-terms query against a standing index built by
    * [[buildIndex]]. The terms arrive as a literal IN filter (they are
    * query parameters, not data), so the postings scan bucket-prunes to
    * the terms' buckets and nothing corpus-sized shuffles — the serving
    * cost is (matched postings) + a per-doc aggregation of the hits.
    * Scores equal [[score]] on the same corpus (shared weight formula;
    * specced). */
  def scoreIndexed(spark: org.apache.spark.sql.SparkSession, name: String,
      queryTerms: Seq[String], idCol: String = "doc_id",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (p, d, stats) = adjustedIndex(spark, name, queryTerms.distinct, idCol)
    p.join(broadcast(d), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w", weight(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"), k1, b))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("w")).as("bm25"))
  }

  /** BATCH serving from the standing index — the production shape for
    * recurring query load: `queries` holds (query_id, term) rows for
    * many bag-of-terms queries at once. The postings scan is probed
    * ONCE with the literal union of all terms (bucket-pruned exactly
    * like [[scoreIndexed]]); per-(doc, term) weights are computed once
    * and fanned out to queries via a broadcast of the tiny query
    * table, so queries sharing a term share the work and the only
    * per-query cost is the final (query, doc) aggregation of matched
    * hits. Scores equal [[scoreBatch]] over the surviving corpus
    * (shared weight formula, same exact tombstone adjustments). */
  def scoreIndexedBatch(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, idCol: String = "doc_id",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = queries.select(col("query_id"), col("term")).distinct()
    // the term union arrives as a literal IN list so the postings scan
    // bucket-prunes; it is query parameters (bounded by the batch), the
    // same driver-side discipline as scoreIndexed's term list
    val terms = q.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    val (p, d, stats) = adjustedIndex(spark, name, terms, idCol)
    p.join(broadcast(d), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w", weight(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"), k1, b))
      .join(broadcast(q), "term") // fan out hits to the queries wanting the term
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("w")).as("bm25"))
  }

  /** The tombstone-adjusted serving view of a standing index, shared by
    * the single-query and batch paths: bucket-pruned postings filtered
    * to `terms`, per-term df, and corpus stats — all exactly as if the
    * tombstoned docs were never indexed (integer decrements; one avgdl
    * division at the end, the same two operands the ad-hoc path's
    * avg(dl) divides, so indexed and ad-hoc weights agree
    * bit-for-bit). */
  private def adjustedIndex(spark: org.apache.spark.sql.SparkSession,
      name: String, terms: Seq[String], idCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    requireServable(spark, name)
    val pRaw = spark.table(s"${name}_postings").filter(col("term").isin(terms: _*))
    val dRaw = spark.table(s"${name}_terms").filter(col("term").isin(terms: _*))
    val statsRaw = spark.table(s"${name}_stats")
    // layout/version check: the stats schema moved from (n_docs, avgdl)
    // to (n_docs, sum_dl) + a doclens table when exact deletes landed.
    // Serving an old index would otherwise die mid-plan with an
    // unresolved-column error — fail fast with the actual remedy.
    require(statsRaw.columns.contains("sum_dl") &&
        spark.catalog.tableExists(s"${name}_doclens"),
      s"index '$name' predates the (sum_dl, doclens) layout — " +
        "rerun buildIndex to upgrade it")
    if (!spark.catalog.tableExists(s"${name}_tombstones"))
      (pRaw, dRaw, statsRaw.select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl")))
    else {
      // serve as if tombstoned docs were never indexed: their
      // postings drop out (anti-join, still bucket-pruned), each
      // term's df loses their postings count, and (N, sum_dl) lose
      // their doc count/lengths — exact integer decrements
      val tomb = spark.table(s"${name}_tombstones").select(col(idCol)).distinct()
      val dfRemoved = pRaw.join(tomb, Seq(idCol), "left_semi")
        .groupBy(col("term")).agg(count(lit(1)).as("__df_rm"))
      val dAdj = dRaw.join(dfRemoved, Seq("term"), "left")
        .select(col("term"),
          (col("df") - coalesce(col("__df_rm"), lit(0L))).as("df"))
      val removed = spark.table(s"${name}_doclens")
        .join(tomb, Seq(idCol), "left_semi")
        .agg(count(lit(1)).as("__n_rm"),
          coalesce(sum(col("dl")), lit(0L)).as("__dl_rm"))
      val statsAdj = statsRaw.crossJoin(removed)
        .select(
          (col("n_docs") - col("__n_rm")).as("n_docs"),
          ((col("sum_dl") - col("__dl_rm")).cast("double") /
            (col("n_docs") - col("__n_rm"))).as("avgdl"))
      (pRaw.join(tomb, Seq(idCol), "left_anti"), dAdj, statsAdj)
    }
  }
}
