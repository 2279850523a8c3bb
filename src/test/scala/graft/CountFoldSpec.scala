package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CountStore, LmStore, NbStore, SampleStore, SketchStore}
import graft.streaming.{CorpusLog, IndexMaintenance, IngestDedup}

/** One admission decision maintains EVERY count-shaped model store
  * (round-11): the gated ingest's classification routes through
  * [[IndexMaintenance.countStoreFold]] into NB / LM / weighted-sample
  * / HLL stores, with the [[CorpusLog]] supplying departing documents'
  * OLD payload for the signed subtractions. The certifying invariant
  * is the q218/q219 equality lifted to the admission gate: after any
  * add/edit/takedown history, each maintained store is BIT-IDENTICAL
  * to a fresh fit of the live admitted corpus. */
class CountFoldSpec extends SparkSpec {
  import spark.implicits._

  private val idx = "cf_idx"; private val sig = "cf_sigs"
  private val log = "cf_log"
  private val nb = "cf_nb"; private val lm = "cf_lm"
  private val smp = "cf_smp"; private val hll = "cf_hll"

  private def doc(i: Int, text: String = null, lang: String = null,
      src: String = null, w: java.lang.Long = null) =
    (i.toLong, Option(text), Option(lang), Option(src),
      Option(w).map(Long.unbox))

  private def mkDf(rows: Seq[(Long, Option[String], Option[String],
      Option[String], Option[Long])]): DataFrame =
    rows.toDF("doc_id", "text", "lang", "src", "w")

  private def baseText(i: Int) =
    s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"

  private def baseDoc(i: Int) = doc(i,
    text = if (i == 25) baseText(5) else baseText(i), // 25 = near-dup of 5
    lang = if (i % 2 == 0) "en" else "de",
    src = s"s${i % 3}", w = (10 + i).toLong)

  private val hh = "cf_hh"; private val kll = "cf_kll"

  private def cleanAll(): Unit = {
    IndexMaintenance.initStores(spark, idx)
    IngestDedup.initStore(spark, sig)
    graft.sources.Sinks.dropTable(spark, sig + "_pending_rm")
    for (t <- Seq(log, log + "_applied",
        nb + "_counts", nb + "_class", nb + "_applied", nb + "_layout",
        lm + "_tri", lm + "_bi", lm + "_uni", lm + "_applied", lm + "_layout",
        smp + "_sample", smp + "_sample_params", smp + "_applied",
        hll + "_hll", hll + "_hll_params", hll + "_applied", hll + "_stale",
        hh + "_hh", hh + "_hh_n", hh + "_hh_params", hh + "_applied",
        hh + "_stale",
        kll + "_kll", kll + "_kll_params", kll + "_applied", kll + "_stale",
        "cff_nb_counts", "cff_nb_class", "cff_nb_layout",
        "cff_lm_tri", "cff_lm_bi",
        "cff_lm_uni", "cff_lm_layout", "cff_smp_sample",
        "cff_smp_sample_params",
        "cff_hll_hll", "cff_hll_hll_params",
        "cff_hh_hh", "cff_hh_hh_n", "cff_hh_hh_params",
        "cff_kll_kll", "cff_kll_kll_params"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log, log + "__compact", nb, lm, smp, hll, hh, kll,
        "cff_nb", "cff_lm",
        "cff_smp", "cff_hll", "cff_hh", "cff_kll"))
      CountStore.setBuilding(spark, n, on = false)
  }

  private def fold = IndexMaintenance.countStoreFold(spark,
    nbStore = Some((nb, "lang")), lmStore = Some(lm),
    sampleStore = Some((smp, "src", "w")), sampleK = 3,
    sketchStore = Some((hll, "lang")),
    hhStore = Some((hh, "src", 10)),
    quantileStore = Some((kll, "src", "w")), buckets = 4)

  private def apply(batch: DataFrame, ver: Long): DataFrame =
    IndexMaintenance.applyGatedUpserts(spark, idx, sig, batch, ver = ver,
      buckets = 4, docFold = Some((log, fold)))

  private def tablesEq(a: String, b: String): Boolean = {
    val x = spark.table(a); val y = spark.table(b)
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  test("maintained stores ≡ fresh fits of the live admitted corpus after add/edit/takedown waves") {
    cleanAll()
    // wave 1: ids 0..19; wave 2: ids 20..39 (25 is an exact dup of 5
    // -> rejected by the admission gate, must never enter any store)
    apply(mkDf((0 until 20).map(baseDoc)), ver = 1L)
    apply(mkDf((20 until 40).map(baseDoc)), ver = 2L)
    // wave 3: edits (ids %5==1: new text, heavier weight; id 11 also
    // MOVES group) + takedowns (ids %5==2)
    val edits = (0 until 40).filter(i => i % 5 == 1).map { i =>
      doc(i, text = baseText(i) + " edited", lang = if (i % 2 == 0) "en" else "de",
        src = if (i == 11) "s9" else s"s${i % 3}", w = (10 + i + 100).toLong)
    }
    val dels = (0 until 40).filter(i => i % 5 == 2 && i != 25)
      .map(i => doc(i))
    val d3 = apply(mkDf(edits ++ dels), ver = 3L).localCheckpoint()
    assert(d3.filter(col("status") === "changed").count() === 8)
    assert(d3.filter(col("status") === "removed").count() === 8)

    // the live admitted corpus the fresh fits use: all 40 minus the
    // rejected dup (25) minus takedowns, with wave-3 edits applied
    val live = (0 until 40)
      .filterNot(_ == 25).filterNot(i => i % 5 == 2)
      .map { i =>
        if (i % 5 == 1)
          doc(i, baseText(i) + " edited", if (i % 2 == 0) "en" else "de",
            if (i == 11) "s9" else s"s${i % 3}", (10 + i + 100).toLong)
        else baseDoc(i)
      }
    val liveDf = mkDf(live)

    // the corpus log's live view IS that corpus
    val logLive = CorpusLog.live(spark, log, "doc_id")
      .select("doc_id", "text", "lang", "src", "w")
    assert(logLive.exceptAll(liveDf).isEmpty && liveDf.exceptAll(logLive).isEmpty)

    // fresh fits over the live corpus
    NbStore.initStore(liveDf, "cff_nb", buckets = 4, labelCol = "lang")
    LmStore.initStore(liveDf, "cff_lm", buckets = 4)
    SampleStore.initStore(liveDf, "cff_smp", "src", "doc_id", "w", k = 3)
    SketchStore.initStore(liveDf, "cff_hll", "lang", "doc_id")

    assert(tablesEq(nb + "_counts", "cff_nb_counts"), "nb counts diverged")
    assert(tablesEq(nb + "_class", "cff_nb_class"), "nb class diverged")
    assert(tablesEq(lm + "_tri", "cff_lm_tri"), "lm trigrams diverged")
    assert(tablesEq(lm + "_bi", "cff_lm_bi"), "lm bigrams diverged")
    assert(tablesEq(lm + "_uni", "cff_lm_uni"), "lm unigrams diverged")
    assert(tablesEq(smp + "_sample", "cff_smp_sample"), "sample diverged")
    val a = SketchStore.estimate(spark, hll)
    val b = SketchStore.estimate(spark, "cff_hll")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "sketch estimates diverged")

    // HH rode the EXACT takedown path in wave 3 (this schedule's
    // departing tokens are all untracked — every per-group count is 1,
    // so the summaries were empty when the departures arrived):
    // maintained state is a VALID MG summary of the live corpus with
    // EXACT totals, but NOT bit-equal to a fresh fit — MG is
    // history-dependent, and only a re-init (the deferral clause,
    // q252's gate) forces equality. So assert the served CONTRACT
    // against the live-corpus truth: n exact, every stored item real,
    // est ≤ true, undercount ≤ the exact d, no heavy (true > d)
    // missing. KLL rides the union-only re-init (no exact path), so
    // its served values still equal a fresh fit (exact regime here —
    // ≤ k values per group, compaction never fired).
    import graft.operators.QuantileStore
    def hhItems(df: DataFrame) = df.select(col("src").as("grp"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
    val hhTruth = hhItems(liveDf).groupBy("grp", "item")
      .agg(count(lit(1)).as("t")).localCheckpoint()
    val hhN = spark.table(hh + "_hh_n").localCheckpoint()
    val liveN = hhItems(liveDf).groupBy("grp").agg(count(lit(1)).as("n"))
    assert(hhN.select("grp", "n").exceptAll(liveN)
      .unionAll(liveN.exceptAll(hhN.select("grp", "n"))).isEmpty,
      "hh totals not exact after the exact-takedown path")
    val hhStore = spark.table(hh + "_hh").localCheckpoint()
    assert(hhStore.join(hhTruth, Seq("grp", "item"), "left_anti").isEmpty,
      "a stored item is absent from the live corpus (est > true = 0)")
    val hhJ = hhStore.join(hhTruth, Seq("grp", "item"))
      .join(hhN.select(col("grp"), col("d")), Seq("grp"))
    assert(hhJ.filter(col("cnt") > col("t")).isEmpty, "hh overestimate")
    assert(hhJ.filter(col("t") - col("cnt") > col("d")).isEmpty,
      "hh undercount beyond the exact d")
    assert(hhTruth.join(hhN.select(col("grp"), col("d")), Seq("grp"))
      .filter(col("t") > col("d"))
      .join(hhStore, Seq("grp", "item"), "left_anti").isEmpty,
      "a true heavy (true > d) dropped out")
    QuantileStore.initStore(liveDf, "cff_kll", "src", "w")
    val qa = QuantileStore.quantiles(spark, kll, Seq(0.1, 0.5, 0.9))
    val qb = QuantileStore.quantiles(spark, "cff_kll", Seq(0.1, 0.5, 0.9))
    assert(qa.exceptAll(qb).unionAll(qb.exceptAll(qa)).isEmpty,
      "kll served quantiles diverged")

    // the rejected near-dup never reached any store
    assert(spark.table(smp + "_sample").filter(col("id") === 25L).isEmpty)
    assert(logLive.filter(col("doc_id") === 25L).isEmpty)
  }

  test("re-delivered batch version is a no-op for every store (fold ledger)") {
    // state carries over from the previous test (same schedule)
    val before = Seq(nb + "_counts", lm + "_uni", smp + "_sample")
      .map(t => t -> spark.table(t).count()).toMap
    val applied = CountStore.alreadyApplied(spark, log, 3L)
    assert(applied, "wave 3 must be in the fold ledger")
    // replay wave 3 verbatim: classification sees all-unchanged, the
    // fold ledger already holds ver 3 — nothing may move
    val edits = (0 until 40).filter(i => i % 5 == 1).map { i =>
      doc(i, text = baseText(i) + " edited", lang = if (i % 2 == 0) "en" else "de",
        src = if (i == 11) "s9" else s"s${i % 3}", w = (10 + i + 100).toLong)
    }
    val dels = (0 until 40).filter(i => i % 5 == 2 && i != 25)
      .map(i => doc(i))
    apply(mkDf(edits ++ dels), ver = 3L)
    for ((t, n) <- before)
      assert(spark.table(t).count() === n, s"$t changed on re-delivery")
  }

  test("corpus log lookup returns the pre-batch payload (prefix-pruned probe)") {
    // after the waves above, id 1 was edited in ver 3: lookup sees v3
    val got = CorpusLog.lookup(spark, log,
      Seq(1L).toDF("doc_id"), "doc_id")
    assert(got.count() === 1)
    assert(got.head().getAs[String]("text") === baseText(1) + " edited")
    // a removed id resolves to NO live row (marker wins)
    val gone = CorpusLog.lookup(spark, log,
      Seq(2L).toDF("doc_id"), "doc_id")
    assert(gone.isEmpty)
  }

  test("corpus log compact preserves the live view") {
    val before = CorpusLog.live(spark, log, "doc_id").collect().toSet
    CorpusLog.compact(spark, log, "doc_id")
    val after = CorpusLog.live(spark, log, "doc_id").collect().toSet
    assert(after === before)
  }

  test("a compact torn inside the swap window heals from staging (r12 advice, high)") {
    // The crash the old design lost the corpus to: compact's swap ran
    // under the fold's own __building marker, which armFold REPAIRS
    // once the batch ledger proves the fold committed — so a crash
    // after drop-log left ledger-committed + marker-cleared + log
    // GONE, and the next append silently recreated an empty log while
    // the corpus sat in __staging. The swap now has its own marker and
    // every entry point replays a torn swap from staging.
    val before = CorpusLog.live(spark, log, "doc_id").collect().toSet
    // simulate the torn window: staging holds the complete fold, the
    // compact marker is down, the log table was already dropped
    val folded = spark.table(log).localCheckpoint()
    graft.sources.Sinks.dropTable(spark, log + "__staging")
    folded.write.mode("overwrite").format("parquet")
      .partitionBy("__pfx").saveAsTable(log + "__staging")
    CountStore.setBuilding(spark, log + "__compact", on = true)
    graft.sources.Sinks.dropTable(spark, log)
    // the next read heals: live view identical, marker lifted, staging gone
    val after = CorpusLog.live(spark, log, "doc_id").collect().toSet
    assert(after === before, "healed live view diverged")
    assert(!CountStore.isBuilding(spark, log + "__compact"))
    assert(!spark.catalog.tableExists(log + "__staging"))
    // and the healed log keeps accepting appends (the lost-corpus
    // symptom was append recreating from scratch)
    assert(spark.catalog.tableExists(log))
  }

  test("compact marker down with the swap already complete = marker lifted, nothing rewritten") {
    CountStore.setBuilding(spark, log + "__compact", on = true)
    val before = CorpusLog.live(spark, log, "doc_id").collect().toSet
    assert(before.nonEmpty)
    assert(!CountStore.isBuilding(spark, log + "__compact"),
      "a completed swap's marker must clear on first entry")
  }

  test("compact marker down with neither log nor staging fails LOUD") {
    val ghost = "cf_ghost_log"
    graft.sources.Sinks.dropTable(spark, ghost)
    graft.sources.Sinks.dropTable(spark, ghost + "__staging")
    CountStore.setBuilding(spark, ghost + "__compact", on = true)
    try {
      intercept[IllegalStateException] {
        CorpusLog.live(spark, ghost, "doc_id")
      }
    } finally CountStore.setBuilding(spark, ghost + "__compact", on = false)
  }

  test("maybeCompact: priced trigger fires only past the backlog threshold") {
    val files = spark.table(log).inputFiles.length
    // far above the current backlog: must be a no-op
    CorpusLog.maybeCompact(spark, log, "doc_id",
      maxFilesPerPrefix = 1000000)
    assert(spark.table(log).inputFiles.length === files)
    // threshold 0: must compact (and shrink the file set — the
    // previous test's compact left one file per live prefix, so the
    // no-op assertion above is what guarantees we measure THIS call)
    val before = CorpusLog.live(spark, log, "doc_id").collect().toSet
    CorpusLog.maybeCompact(spark, log, "doc_id", maxFilesPerPrefix = 0)
    assert(CorpusLog.live(spark, log, "doc_id").collect().toSet === before)
  }

  test("a torn gated batch is LOUD on re-delivery (marker spans index + fold)") {
    // simulate the crash window: the fold marker went down before the
    // index mutated and never came back up. The re-delivered batch
    // must fail at the window-open requireServable — the silent
    // alternative (classify-all-unchanged, skip the fold, commit the
    // ledger) would desync every store forever.
    CountStore.setBuilding(spark, log, on = true)
    try {
      intercept[IllegalArgumentException] {
        apply(mkDf(Seq(doc(900, "torn batch probe text", "en", "s0", 5L))),
          ver = 9L)
      }
    } finally CountStore.setBuilding(spark, log, on = false)
  }

  test("departures that were never logged fail loud (no silent skipped subtraction)") {
    // a fresh index+sig universe WITHOUT the fold, so content exists
    // that the corpus log never saw; attaching the fold and editing
    // that content must throw, not silently skip the subtraction
    val idx2 = "cf2_idx"; val sig2 = "cf2_sigs"; val log2 = "cf2_log"
    IndexMaintenance.initStores(spark, idx2)
    IngestDedup.initStore(spark, sig2)
    graft.sources.Sinks.dropTable(spark, sig2 + "_pending_rm")
    for (t <- Seq(log2, log2 + "_applied", "cf2_nb_counts", "cf2_nb_class"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log2, "cf2_nb")) CountStore.setBuilding(spark, n, on = false)
    // wave 1: UNFOLDED — the index learns doc 1, the log does not
    IndexMaintenance.applyGatedUpserts(spark, idx2, sig2,
      mkDf(Seq(doc(1, "original text here", "en", "s0", 5L))), ver = 1L,
      buckets = 4)
    // wave 2: fold attached, doc 1 edited -> its old payload is not in
    // the log -> loud
    val f2 = IndexMaintenance.countStoreFold(spark,
      nbStore = Some(("cf2_nb", "lang")), buckets = 4)
    val e = intercept[IllegalArgumentException] {
      IndexMaintenance.applyGatedUpserts(spark, idx2, sig2,
        mkDf(Seq(doc(1, "edited text here", "en", "s0", 5L))), ver = 2L,
        buckets = 4, docFold = Some((log2, f2)))
    }
    assert(e.getMessage.contains("departures"))
  }

  test("LIVE-STREAM face: maintainStreamDeduped with the docFold equals the batch replay") {
    // the headline as the user actually deploys it — a real file
    // stream through maintainStreamDeduped carrying the fold; the
    // stream-maintained NB store must equal a fresh fit of the live
    // admitted corpus, exactly like the batch-replay gate (q245)
    val idx3 = "cf3_idx"; val sig3 = "cf3_sigs"; val log3 = "cf3_log"
    IndexMaintenance.initStores(spark, idx3)
    IngestDedup.initStore(spark, sig3)
    graft.sources.Sinks.dropTable(spark, sig3 + "_pending_rm")
    for (t <- Seq(log3, log3 + "_applied", "cf3_nb_counts", "cf3_nb_class",
        "cf3f_nb_counts", "cf3f_nb_class"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log3, "cf3_nb", "cf3f_nb"))
      CountStore.setBuilding(spark, n, on = false)
    val f3 = IndexMaintenance.countStoreFold(spark,
      nbStore = Some(("cf3_nb", "lang")), buckets = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_cf_stream").toString
    def write(df: DataFrame) = df.repartition(1).write.mode("append").parquet(dir)
    write(mkDf((100 until 110).map(baseDoc)))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = IndexMaintenance.maintainStreamDeduped(stream, idx3, sig3,
        (_, _) => (), buckets = 4, docFold = Some((log3, f3)))
      .start()
    q.processAllAvailable()
    // wave 2: new docs + an edit + a takedown of streamed content
    write(mkDf((110 until 115).map(baseDoc) :+
      doc(102, baseText(102) + " v2", "en", "s0", 999L) :+ doc(105)))
    q.processAllAvailable()
    q.stop()
    val live = ((100 until 115).filterNot(_ == 105).filterNot(_ == 102)
      .map(baseDoc)) :+ doc(102, baseText(102) + " v2", "en", "s0", 999L)
    NbStore.initStore(mkDf(live), "cf3f_nb", buckets = 4, labelCol = "lang")
    assert(tablesEq("cf3_nb_counts", "cf3f_nb_counts"),
      "stream-maintained nb counts diverged from the fresh fit")
    assert(tablesEq("cf3_nb_class", "cf3f_nb_class"))
  }

  test("UNGATED stream face (r12): maintainStream with docFold equals the fresh fit") {
    // the count-model fold without the dedup gate — applyUpsertsFolded
    // under maintainStream: every live row is admitted, the same
    // armFold/closeFold exactly-once window applies
    val idx6 = "cf6_idx"; val log6 = "cf6_log"
    IndexMaintenance.initStores(spark, idx6)
    for (t <- Seq(log6, log6 + "_applied", "cf6_nb_counts", "cf6_nb_class",
        "cf6f_nb_counts", "cf6f_nb_class"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log6, "cf6_nb", "cf6f_nb"))
      CountStore.setBuilding(spark, n, on = false)
    val f6 = IndexMaintenance.countStoreFold(spark,
      nbStore = Some(("cf6_nb", "lang")), buckets = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_cf6_stream").toString
    def write(df: DataFrame) = df.repartition(1).write.mode("append").parquet(dir)
    write(mkDf((400 until 410).map(baseDoc)))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = IndexMaintenance.maintainStream(stream, idx6,
        (_, _) => (), buckets = 4, docFold = Some((log6, f6)))
      .start()
    q.processAllAvailable()
    write(mkDf((410 until 415).map(baseDoc) :+
      doc(402, baseText(402) + " v2", "en", "s0", 999L) :+ doc(405)))
    q.processAllAvailable()
    q.stop()
    val live = ((400 until 415).filterNot(_ == 405).filterNot(_ == 402)
      .map(baseDoc)) :+ doc(402, baseText(402) + " v2", "en", "s0", 999L)
    NbStore.initStore(mkDf(live), "cf6f_nb", buckets = 4, labelCol = "lang")
    assert(tablesEq("cf6_nb_counts", "cf6f_nb_counts"),
      "ungated stream-maintained nb counts diverged from the fresh fit")
    assert(tablesEq("cf6_nb_class", "cf6f_nb_class"))
    // the log's live view is the full upsert stream's live set
    val logLive = CorpusLog.live(spark, log6, "doc_id")
      .select("doc_id", "text", "lang", "src", "w")
    val liveDf = mkDf(live)
    assert(logLive.exceptAll(liveDf).isEmpty && liveDf.exceptAll(logLive).isEmpty)
  }

  test("payload schema drift fails loud") {
    intercept[IllegalArgumentException] {
      CorpusLog.append(spark, log,
        Seq((999L, "x")).toDF("doc_id", "text"),
        spark.range(0).select(col("id").as("doc_id")), "doc_id", ver = 99L)
    }
  }

  test("payload TYPE drift fails loud (name-equal, type-changed column)") {
    // same column names as the standing log, but w long -> string:
    // the (name, type) guard must reject it BEFORE unionByName can
    // widen it into a corrupted 'old payload'
    intercept[IllegalArgumentException] {
      CorpusLog.append(spark, log,
        Seq((999L, "x", "en", "s0", "not-a-long"))
          .toDF("doc_id", "text", "lang", "src", "w"),
        spark.range(0).select(col("id").as("doc_id")), "doc_id", ver = 99L)
    }
  }

  private val idx4 = "cf4_idx"; private val sig4 = "cf4_sigs"
  private val log4 = "cf4_log"; private val hll4 = "cf4_hll"

  test("deferred union-only takedowns: N departure batches cost ONE re-init") {
    IndexMaintenance.initStores(spark, idx4)
    IngestDedup.initStore(spark, sig4)
    graft.sources.Sinks.dropTable(spark, sig4 + "_pending_rm")
    for (t <- Seq(log4, log4 + "_applied", hll4 + "_hll",
        hll4 + "_hll_params", hll4 + "_stale", "cf4f_hll", "cf4f_hll_params"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log4, hll4, "cf4f")) CountStore.setBuilding(spark, n, on = false)
    val f4 = IndexMaintenance.countStoreFold(spark,
      sketchStore = Some((hll4, "lang")), refitBacklog = 2)
    def app(batch: DataFrame, ver: Long) =
      IndexMaintenance.applyGatedUpserts(spark, idx4, sig4, batch, ver = ver,
        buckets = 4, docFold = Some((log4, f4)))
    app(mkDf((200 until 210).map(baseDoc)), ver = 1L)
    val snap = SketchStore.estimate(spark, hll4).localCheckpoint()
    // departure batch 1: DEFERRED — store bit-still, backlog = 1
    app(mkDf(Seq(doc(200))), ver = 2L)
    assert(SketchStore.estimate(spark, hll4).exceptAll(snap).isEmpty,
      "a deferred takedown mutated the store")
    assert(CountStore.stalePending(spark, hll4) === ((1L, 1L)))
    // departure batch 2 crosses refitBacklog = 2: ONE re-init settles
    // both pending departures, backlog cleared
    app(mkDf(Seq(doc(201))), ver = 3L)
    assert(CountStore.stalePending(spark, hll4) === ((0L, 0L)))
    import graft.operators.SketchStore
    SketchStore.initStore(mkDf((202 until 210).map(baseDoc)), "cf4f",
      "lang", "doc_id")
    val a = SketchStore.estimate(spark, hll4)
    val b = SketchStore.estimate(spark, "cf4f")
    assert(a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty,
      "post-threshold re-init diverged from a fresh fit of the live set")
    // one more deferred departure; refreshCountStores (the
    // serve-with-guarantee trigger) settles it without a threshold
    app(mkDf(Seq(doc(202))), ver = 4L)
    assert(CountStore.stalePending(spark, hll4)._1 === 1L)
    IndexMaintenance.refreshCountStores(spark, log4,
      sketchStore = Some((hll4, "lang")))
    assert(CountStore.stalePending(spark, hll4) === ((0L, 0L)))
    SketchStore.initStore(mkDf((203 until 210).map(baseDoc)), "cf4f",
      "lang", "doc_id")
    val a2 = SketchStore.estimate(spark, hll4)
    val b2 = SketchStore.estimate(spark, "cf4f")
    assert(a2.exceptAll(b2).unionAll(b2.exceptAll(a2)).isEmpty,
      "refreshCountStores diverged from a fresh fit")
  }

  test("SAMPLE deferral: N departure batches cost ONE group-pruned refit; maintained ≡ fresh fit") {
    // the r12 verdict's #2: the sample store was the one fold family
    // still paying a live read per departure batch — it now rides the
    // same refitBacklog machinery, with the departing IDS accumulated
    // so the eventual refit stays group-pruned
    val idx7 = "cf7_idx"; val sig7 = "cf7_sigs"; val log7 = "cf7_log"
    val smp7 = "cf7_smp"
    IndexMaintenance.initStores(spark, idx7)
    IngestDedup.initStore(spark, sig7)
    graft.sources.Sinks.dropTable(spark, sig7 + "_pending_rm")
    for (t <- Seq(log7, log7 + "_applied", smp7 + "_sample",
        smp7 + "_sample_params", smp7 + "_stale", smp7 + "_stale_ids",
        smp7 + "_layout",
        "cf7f_smp_sample", "cf7f_smp_sample_params", "cf7f_smp_layout"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log7, smp7, "cf7f_smp"))
      CountStore.setBuilding(spark, n, on = false)
    val f7 = IndexMaintenance.countStoreFold(spark,
      sampleStore = Some((smp7, "src", "w")), sampleK = 2, refitBacklog = 2)
    def app(batch: DataFrame, ver: Long) =
      IndexMaintenance.applyGatedUpserts(spark, idx7, sig7, batch, ver = ver,
        buckets = 4, docFold = Some((log7, f7)))
    app(mkDf((500 until 512).map(baseDoc)), ver = 1L)
    // pick a SAMPLED id to take down — the departure that must
    // eventually force its group's refit (a below-k departure would
    // pass vacuously)
    val sampledId = SampleStore.sample(spark, smp7)
      .orderBy(col("id")).head().getAs[Long]("id")
    val snap = spark.table(smp7 + "_sample").localCheckpoint()
    // departure batch 1: DEFERRED — store bit-still, backlog (1, 1)
    app(mkDf(Seq(doc(sampledId.toInt))), ver = 2L)
    assert(spark.table(smp7 + "_sample").exceptAll(snap).isEmpty,
      "a deferred sample departure mutated the store")
    assert(CountStore.stalePending(spark, smp7) === ((1L, 1L)))
    // departure batch 2 crosses refitBacklog = 2: ONE refit settles
    // both pending departures and clears both ledgers
    val gone2 = (500 until 512).map(_.toLong)
      .filterNot(_ == sampledId).head
    app(mkDf(Seq(doc(gone2.toInt))), ver = 3L)
    assert(CountStore.stalePending(spark, smp7) === ((0L, 0L)))
    assert(!spark.catalog.tableExists(smp7 + "_stale_ids"),
      "the pending-id ledger must clear with the refit")
    val live7 = mkDf((500 until 512).map(baseDoc)
      .filterNot(r => r._1 == sampledId || r._1 == gone2))
    SampleStore.initStore(live7, "cf7f_smp", "src", "doc_id", "w", k = 2)
    assert(tablesEq(smp7 + "_sample", "cf7f_smp_sample"),
      "deferred-refit sample diverged from a fresh fit of the live set")
    // one more deferred departure; the serve-with-guarantee face
    // (sample(maxStale = 0, refresh)) settles it at serve time and the
    // served rows equal the fresh fit's serve
    val sampled2 = SampleStore.sample(spark, smp7)
      .orderBy(col("id")).head().getAs[Long]("id")
    app(mkDf(Seq(doc(sampled2.toInt))), ver = 4L)
    assert(CountStore.stalePending(spark, smp7)._1 === 1L)
    val served = SampleStore.sample(spark, smp7, maxStale = 0,
      refresh = () => IndexMaintenance.refreshCountStores(spark, log7,
        sampleStore = Some((smp7, "src", "w"))))
    assert(CountStore.stalePending(spark, smp7) === ((0L, 0L)))
    SampleStore.initStore(live7.filter(col("doc_id") =!= sampled2),
      "cf7f_smp", "src", "doc_id", "w", k = 2)
    val freshServe = SampleStore.sample(spark, "cf7f_smp")
    assert(served.exceptAll(freshServe).unionAll(freshServe.exceptAll(served))
      .isEmpty, "maxStale serve diverged from the fresh fit's serve")
  }

  test("exact-path HH wave still settles a backlog at the bound (the bound is exact)") {
    // r12 verdict #6: a departure that rides removeDocsExact does not
    // MARK — but if the store already sits at the threshold, the refit
    // must fire on this wave, not one wave later
    val idx8 = "cf8_idx"; val sig8 = "cf8_sigs"; val log8 = "cf8_log"
    val hh8 = "cf8_hh"
    IndexMaintenance.initStores(spark, idx8)
    IngestDedup.initStore(spark, sig8)
    graft.sources.Sinks.dropTable(spark, sig8 + "_pending_rm")
    for (t <- Seq(log8, log8 + "_applied", hh8 + "_hh", hh8 + "_hh_n",
        hh8 + "_hh_params", hh8 + "_stale", hh8 + "_layout",
        "cf8f_hh_hh", "cf8f_hh_hh_n", "cf8f_hh_hh_params", "cf8f_hh_layout"))
      graft.sources.Sinks.dropTable(spark, t)
    for (n <- Seq(log8, hh8, "cf8f_hh"))
      CountStore.setBuilding(spark, n, on = false)
    // k = 2 with 6 distinct tokens per doc: per-group counts are all 1
    // at bootstrap, compress leaves (almost) nothing tracked — so a
    // later single-doc departure's tokens are all UNTRACKED and ride
    // the exact path
    val f8 = IndexMaintenance.countStoreFold(spark,
      hhStore = Some((hh8, "src", 2)), refitBacklog = 2)
    def app(batch: DataFrame, ver: Long) =
      IndexMaintenance.applyGatedUpserts(spark, idx8, sig8, batch, ver = ver,
        buckets = 4, docFold = Some((log8, f8)))
    app(mkDf((600 until 612).map(baseDoc)), ver = 1L)
    // force the backlog TO the bound without a departure wave (the
    // two-folds-one-store / lowered-bound scenario)
    CountStore.markStale(spark, hh8, 1L)
    CountStore.markStale(spark, hh8, 1L)
    assert(CountStore.stalePending(spark, hh8)._1 === 2L)
    // the exact-path departure wave: all of doc 600's tokens are
    // untracked, removeDocsExact succeeds — and the threshold check
    // must STILL fire the refit this wave
    app(mkDf(Seq(doc(600))), ver = 2L)
    assert(CountStore.stalePending(spark, hh8) === ((0L, 0L)),
      "an exact-path wave skipped the threshold check at the bound")
    // and the refit left a state ≡ fresh fit of the live set
    import graft.operators.HhStore
    val live8 = mkDf((601 until 612).map(baseDoc))
    HhStore.initStore(live8.select(col("src").as("grp"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("item")),
      "cf8f_hh", "grp", "item", k = 2)
    assert(tablesEq(hh8 + "_hh", "cf8f_hh_hh"), "hh diverged post-refit")
    assert(tablesEq(hh8 + "_hh_n", "cf8f_hh_hh_n"), "hh_n diverged post-refit")
  }

  test("marker down + ledger committed = repaired on re-delivery, not a rebuild demand") {
    // simulate the crash window between markApplied(ver) and
    // setBuilding(off): the prior test left ver 4 committed; put the
    // marker back down and re-deliver ver 4 — the arming logic must
    // clear the marker (the ledger row proves completion) and no-op
    CountStore.setBuilding(spark, log4, on = true)
    val f4 = IndexMaintenance.countStoreFold(spark,
      sketchStore = Some((hll4, "lang")), refitBacklog = 2)
    IndexMaintenance.applyGatedUpserts(spark, idx4, sig4,
      mkDf(Seq(doc(202))), ver = 4L, buckets = 4,
      docFold = Some((log4, f4)))
    assert(!CountStore.isBuilding(spark, log4),
      "the completed-batch marker was not cleared")
  }

  test("a fold torn BETWEEN family writes is loud on re-delivery; rebuild recovers") {
    val idx5 = "cf5_idx"; val sig5 = "cf5_sigs"; val log5 = "cf5_log"
    def cleanUniverse(): Unit = {
      IndexMaintenance.initStores(spark, idx5)
      IngestDedup.initStore(spark, sig5)
      graft.sources.Sinks.dropTable(spark, sig5 + "_pending_rm")
      for (t <- Seq(log5, log5 + "_applied", "cf5_nb_counts", "cf5_nb_class",
          "cf5_lm_tri", "cf5_lm_bi", "cf5_lm_uni", "cf5f_nb_counts",
          "cf5f_nb_class"))
        graft.sources.Sinks.dropTable(spark, t)
      for (n <- Seq(log5, "cf5_nb", "cf5_lm", "cf5f_nb"))
        CountStore.setBuilding(spark, n, on = false)
    }
    cleanUniverse()
    val goodFold = IndexMaintenance.countStoreFold(spark,
      nbStore = Some(("cf5_nb", "lang")), lmStore = Some("cf5_lm"),
      buckets = 4)
    val nbOnly = IndexMaintenance.countStoreFold(spark,
      nbStore = Some(("cf5_nb", "lang")), buckets = 4)
    // a fold that dies after the NB family wrote but before LM did —
    // the multi-store analog of a torn CountStore commit
    val tornFold: IndexMaintenance.DocFold = (gone, put, live) => {
      nbOnly(gone, put, live)
      throw new RuntimeException("simulated crash between family writes")
    }
    val batch = mkDf((300 until 310).map(baseDoc))
    intercept[RuntimeException] {
      IndexMaintenance.applyGatedUpserts(spark, idx5, sig5, batch, ver = 1L,
        buckets = 4, docFold = Some((log5, tornFold)))
    }
    // NB exists, LM does not — a torn multi-family state; the marker
    // is still down and the ledger has no ver 1, so the re-delivered
    // batch must fail LOUD at the window-open guard (a silent replay
    // would double-fold NB)
    assert(spark.catalog.tableExists("cf5_nb_counts"))
    assert(!spark.catalog.tableExists("cf5_lm_uni"))
    assert(CountStore.isBuilding(spark, log5))
    val e = intercept[IllegalArgumentException] {
      IndexMaintenance.applyGatedUpserts(spark, idx5, sig5, batch, ver = 1L,
        buckets = 4, docFold = Some((log5, goodFold)))
    }
    assert(e.getMessage.contains("rebuild"))
    // documented recovery: rebuild stores + log from the upstream
    // corpus (the initStore paths) — then the replay completes and the
    // stores equal fresh fits
    cleanUniverse()
    IndexMaintenance.applyGatedUpserts(spark, idx5, sig5, batch, ver = 1L,
      buckets = 4, docFold = Some((log5, goodFold)))
    NbStore.initStore(batch, "cf5f_nb", buckets = 4, labelCol = "lang")
    assert(tablesEq("cf5_nb_counts", "cf5f_nb_counts"),
      "rebuilt-and-replayed NB diverged from a fresh fit")
    assert(spark.catalog.tableExists("cf5_lm_uni"),
      "the LM family did not complete after recovery")
  }

  test("a multi-family takedown wave reads the live corpus EXACTLY ONCE (r14: shared fold live pass)") {
    cleanAll()
    // every doc carries a COMMON token so the HH summaries TRACK the
    // departing doc's items — forcing HH onto the union-only re-init
    // clause (not the exact in-place path); HLL and KLL re-init on any
    // departure, and the sample family's dropDocs reads live too. At
    // refitBacklog = 1 (this fold's default) the wave used to cost one
    // corpus-sized live() read PER FAMILY; the shared lazy pass makes
    // it exactly one, counted by CorpusLog.liveReads (steal-immune,
    // the ProbeFoldTakedown discipline).
    def cDoc(i: Int) = doc(i, text = "common " + baseText(i),
      lang = if (i % 2 == 0) "en" else "de", src = s"s${i % 3}",
      w = (10 + i).toLong)
    apply(mkDf((400 until 412).map(cDoc)), ver = 1L)
    val reads0 = CorpusLog.liveReads.get()
    val d = apply(mkDf(Seq(doc(403)) ++ Seq(doc(406))), ver = 2L)
    assert(d.filter(col("status") === "removed").count() === 2)
    val reads = CorpusLog.liveReads.get() - reads0
    assert(reads === 1,
      s"takedown wave cost $reads live passes — the fold's families " +
        "must share ONE materialized live view")
    // and the shared pass still settles every family: the maintained
    // stores match fresh fits of the retained corpus (the suite's
    // headline equality, re-checked on this schedule for the two
    // families whose refit path the shared pass rewired)
    val liveDf = mkDf((400 until 412).filterNot(i => i == 403 || i == 406)
      .map(cDoc))
    SketchStore.initStore(liveDf, "cff_hll", "lang", "doc_id")
    val a = SketchStore.estimate(spark, hll)
    val b = SketchStore.estimate(spark, "cff_hll")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "sketch estimates diverged after the shared-pass refit")
    def hhFeed(df: DataFrame) = df.select(col("src").as("grp"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
    graft.operators.HhStore.initStore(hhFeed(liveDf), "cff_hh",
      "grp", "item", k = 10)
    assert(tablesEq(hh + "_hh", "cff_hh_hh"),
      "hh summary diverged after the shared-pass re-init")
    assert(tablesEq(hh + "_hh_n", "cff_hh_hh_n"),
      "hh totals diverged after the shared-pass re-init")
  }
}
