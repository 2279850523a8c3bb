package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ADMITTED-CORPUS LOG — the standing record of what the gated
  * ingest admitted, with full payload: (id, payload columns…, __ver,
  * __deleted), append-only, Hive-partitioned by
  * `__pfx = pmod(xxhash64(id), 64)`.
  *
  * Why it exists: the count-model stores (NB, LM, weighted sample)
  * subtract a departing document's OLD content — counts are signed,
  * so an edit is "−old +new" — but the ingest pipeline's fingerprint
  * log keeps only content HASHES. A real pipeline retains its admitted
  * corpus anyway (the corpus IS the product); this log is that
  * retention in the exact shape the per-batch probe wants: the
  * `_fplog` discipline (IndexMaintenance.scala — file-pruned probe,
  * latest-ver-wins fold) extended to carry the payload.
  *
  * Scale shape: appends are delta-sized file drops into ≤64 prefix
  * partitions. The per-batch old-payload probe prunes the log's FILES
  * to the batch's prefix set (a ≤64-int literal partition filter),
  * broadcasts the batch ids into a semi-join, and takes
  * latest-ver-wins over only the matching rows — nothing log-sized
  * shuffles, and the bytes READ are bounded by the batch's prefixes
  * however large the log grows (the ProbeFplogPrune argument,
  * payload-carrying). [[live]] is the one deliberately corpus-sized
  * read (sketch re-init, sample group refit — both stated costs);
  * [[compact]] folds the per-batch file accumulation back to one row
  * per live id. */
object CorpusLog {

  /** Partition-count twin of IndexMaintenance.FP_PREFIXES: bounds the
    * probe's literal In-filter while keeping per-append file counts
    * sane. */
  val Prefixes = 64

  private def pfx(idCol: String) =
    pmod(xxhash64(col(idCol)), lit(Prefixes))

  private def payloadCols(t: DataFrame, idCol: String): Seq[String] =
    t.columns.filterNot(c =>
      c == idCol || c == "__ver" || c == "__deleted" || c == "__pfx").toSeq

  // ---- compact-swap marker (r12 advice, HIGH) ----
  // compact's drop/recreate swap used to run under the fold's OWN
  // `__building` marker — but that marker doubles as the fold's
  // exactly-once signal, and armFold REPAIRS it (clears it) whenever
  // the batch ledger proves the fold committed. compact runs AFTER
  // that commit (closeFold: markApplied → marker up → maybeCompact),
  // so a crash inside the swap left exactly the state the repair
  // clears: ledger committed, marker down, log table GONE — and the
  // next batch's append would silently recreate an empty log while
  // the entire admitted corpus sat in `__staging`, lost to every later
  // signed subtraction. The swap now runs under its OWN marker, which
  // armFold never touches, and every CorpusLog entry point first
  // REDOES a torn swap idempotently from the durable staging copy
  // (the swap is a pure function of staging, so replaying it is safe
  // from any crash point).

  private def compactMarker(name: String) = s"${name}__compact"

  /** Heal a swap the compact marker proves was torn. Every read/write
    * entry point runs this — deliberately NOT the fold's `__building`
    * guard (append runs INSIDE the fold's own marker window); the
    * marker probe is one fs.exists, the heal path only ever runs
    * after a real crash. */
  private def recoverCompact(spark: SparkSession, name: String): Unit = {
    if (graft.operators.CountStore.isBuilding(spark, compactMarker(name))) {
      val staging = s"${name}__staging"
      if (spark.catalog.tableExists(staging)) {
        // the swap never finished — staging holds the complete fold
        // (it is written in full BEFORE the marker goes down), so
        // replay the swap: drop whatever partial log exists, recreate
        // from staging, clear.
        graft.sources.Sinks.dropTable(spark, name)
        spark.table(staging).write.mode("append").format("parquet")
          .partitionBy("__pfx").saveAsTable(name)
        graft.sources.Sinks.dropTable(spark, staging)
        graft.operators.CountStore.setBuilding(spark, compactMarker(name),
          on = false)
      } else if (spark.catalog.tableExists(name)) {
        // swap completed (staging already dropped); only the marker
        // lift was lost — clear it.
        graft.operators.CountStore.setBuilding(spark, compactMarker(name),
          on = false)
      } else {
        // neither staging nor the log: not a state compact can produce
        // — refuse loudly rather than let append recreate from scratch.
        throw new IllegalStateException(
          s"corpus log '$name': compact marker is down but neither the " +
            "log nor its staging copy exists — rebuild the log (and the " +
            "stores it feeds) from the upstream corpus")
      }
    }
  }

  /** Append one batch's upserts: `puts` (full payload rows — admitted
    * adds and new versions of edits) plus delete markers for
    * `removedIds` (same schema, null payload, __deleted = true), all
    * stamped `ver`. Schema-guarded against the existing log (a payload
    * column that silently vanished would corrupt every later
    * subtraction). */
  def append(spark: SparkSession, name: String, puts: DataFrame,
      removedIds: DataFrame, idCol: String, ver: Long): Unit = {
    recoverCompact(spark, name)
    val markers = removedIds
      .select(col(removedIds.columns.head).cast("long").as(idCol))
      .select(col(idCol) +: puts.schema.fields.filterNot(_.name == idCol)
        .map(f => lit(null).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      .withColumn("__deleted", lit(true))
    val rows = puts.withColumn("__deleted", lit(false))
      .unionByName(markers)
      .withColumn("__ver", lit(ver))
      .withColumn("__pfx", pfx(idCol))
    if (!spark.catalog.tableExists(name)) {
      // stale-location clearing on first create (fresh catalog over an
      // old warehouse), the standing-store discipline
      graft.sources.Sinks.dropTable(spark, name)
    } else {
      // (name, type) pairs, not names alone: a payload column whose TYPE
      // changed would pass a name-only check and either fail later inside
      // unionByName or silently widen via implicit cast, corrupting the
      // "old payload" the signed subtractions rely on (r11 advice).
      def shape(t: DataFrame) = {
        val pc = payloadCols(t, idCol).toSet
        t.schema.fields.filter(f => pc(f.name))
          .map(f => (f.name, f.dataType.catalogString)).sortBy(_._1).toSeq
      }
      val have = shape(spark.table(name))
      val got = shape(puts)
      require(have == got,
        s"corpus log '$name': payload schema changed ($have -> $got) — " +
          "rebuild the log (and the stores it feeds) before continuing")
    }
    rows.write.mode("append").format("parquet")
      .partitionBy("__pfx").saveAsTable(name)
  }

  /** Latest-wins LIVE payload for ONLY the given ids — the per-batch
    * old-content probe: prefix partition pruning + broadcast semi-join,
    * batch-bounded however large the log is. Checkpoint-settled (the
    * caller appends this batch's new versions right after — a lazy
    * plan would re-read the log post-append). */
  def lookup(spark: SparkSession, name: String, ids: DataFrame,
      idCol: String): DataFrame = {
    recoverCompact(spark, name)
    require(spark.catalog.tableExists(name),
      s"corpus log '$name' does not exist — the log must be attached " +
        "from the fold's first batch")
    val prefixes = ids.select(pfx(idCol).as("p")).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
    latestWins(spark.table(name)
        .filter(col("__pfx").isin(prefixes: _*))
        .join(broadcast(ids.select(col(idCol))), Seq(idCol), "left_semi"),
      idCol)
      .localCheckpoint()
  }

  /** Count of [[live]] calls this JVM — the fold's "live passes" are
    * exactly these, so probes can report the STRUCTURAL deferral win
    * (live-pass count per schedule) independent of host steal, which
    * regularly contaminates wall clocks on this class of machine. */
  val liveReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The full LIVE corpus (latest-wins over every id, markers drop
    * out) — deliberately corpus-sized; consumed only by the stated
    * full-pass paths (sketch re-init, sample group refit). */
  def live(spark: SparkSession, name: String, idCol: String): DataFrame = {
    liveReads.incrementAndGet()
    recoverCompact(spark, name)
    require(spark.catalog.tableExists(name),
      s"corpus log '$name' does not exist")
    latestWins(spark.table(name), idCol)
  }

  private def latestWins(rows: DataFrame, idCol: String): DataFrame = {
    val pc = payloadCols(rows, idCol)
    rows.groupBy(col(idCol))
      .agg(max_by(
        struct((pc.map(col) :+ col("__deleted")): _*), col("__ver")).as("s"))
      .select(col(idCol) +: pc.map(c => col(s"s.$c").as(c))
        :+ col("s.__deleted").as("__deleted"): _*)
      .filter(!col("__deleted")).drop("__deleted")
  }

  /** Backlog-triggered [[compact]]: fold the log once it accumulates
    * more than `maxFilesPerPrefix` files per prefix on average — each
    * batch drops at least one file into every touched prefix, so
    * without a trigger a long-lived stream degrades every lookup's
    * file pruning. The policy CHECK is a driver-side file listing (no
    * Spark job) — the same priced-policy discipline as
    * tombstoneBacklog / sweepSignatures. Wired into the gated-batch
    * fold; callers on their own cadence can call [[compact]] directly. */
  def maybeCompact(spark: SparkSession, name: String, idCol: String,
      maxFilesPerPrefix: Int = 8): Unit = {
    recoverCompact(spark, name)
    if (spark.catalog.tableExists(name) &&
        spark.table(name).inputFiles.length >
          maxFilesPerPrefix.toLong * Prefixes)
      compact(spark, name, idCol)
  }

  /** Fold the append-only log to one row per live id (latest ver kept,
    * markers and superseded versions drop) — run on the same
    * maintenance cadence as compactFingerprints; also folds the
    * per-batch file accumulation inside each prefix.
    *
    * DURABILITY (r11 advice, medium): the log is the system's ONLY
    * retention of admitted payloads, and [[maybeCompact]] auto-fires
    * this in the hot streaming fold — so the fold is written to a
    * DURABLE staging table FIRST, while the original log is still
    * intact; only then does the marker-guarded swap (drop + recreate
    * from staging) run. At every instant a durable on-disk copy of
    * the corpus exists: a crash before the swap loses nothing (the
    * original serves, staging is garbage-collected on the next
    * compact), a crash inside the swap window leaves the COMPACT
    * marker down with the complete fold sitting in `<name>__staging` —
    * and every CorpusLog entry point replays the swap from staging
    * automatically ([[recoverCompact]]), so recovery costs one
    * staging-sized rewrite, never an upstream re-ingest. The swap
    * marker is DISTINCT from the fold's `__building` marker (r12
    * advice, high — see [[recoverCompact]]'s scaladoc for why reusing
    * the fold marker silently lost the log). The earlier
    * localCheckpoint-then-rewrite held the only copy in executor
    * block state mid-rewrite. */
  def compact(spark: SparkSession, name: String, idCol: String): Unit = {
    recoverCompact(spark, name)
    if (!spark.catalog.tableExists(name)) return
    // a log whose FOLD marker is down is mid-batch or torn — folding
    // it would mask the loud state the marker exists to preserve
    graft.operators.CountStore.requireServable(spark, name)
    val staging = s"${name}__staging"
    graft.sources.Sinks.dropTable(spark, staging)
    val t = spark.table(name)
    val pc = payloadCols(t, idCol)
    t.groupBy(col(idCol))
      .agg(max_by(struct((pc.map(col) :+ col("__deleted") :+ col("__ver")): _*),
        col("__ver")).as("s"))
      .select(col(idCol) +: pc.map(c => col(s"s.$c").as(c))
        :+ col("s.__deleted").as("__deleted") :+ col("s.__ver").as("__ver"): _*)
      .filter(!col("__deleted"))
      .withColumn("__pfx", pfx(idCol))
      .write.mode("overwrite").format("parquet")
      .partitionBy("__pfx").saveAsTable(staging)
    graft.operators.CountStore.setBuilding(spark, compactMarker(name), on = true)
    graft.sources.Sinks.dropTable(spark, name)
    spark.table(staging).write.mode("append").format("parquet")
      .partitionBy("__pfx").saveAsTable(name)
    graft.sources.Sinks.dropTable(spark, staging)
    graft.operators.CountStore.setBuilding(spark, compactMarker(name), on = false)
  }
}
