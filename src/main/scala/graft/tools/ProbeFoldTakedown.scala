package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.CountStore
import graft.streaming.{IndexMaintenance, IngestDedup}

/** Round-12 verdict #1 measurement, extended to FOUR families in
  * r13 (verdict #2): a TRICKLE of takedown batches against the gated
  * fold with the three union-only sketch families (HLL + HH + KLL)
  * plus the weighted SAMPLE store attached. At `refitBacklog` = 1
  * (the r11 semantics) every departure batch re-inits the sketch
  * stores over the live corpus AND pays the sample's dropDocs live
  * read — N batches, 4·N corpus passes. With the deferral
  * (`refitBacklog` > N) each batch only appends a one-row staleness
  * mark (plus the sample's takedown-sized pending-id rows); ONE
  * `refreshCountStores` at the end settles everything — N batches,
  * 4 corpus passes total. The probe times both schedules on the same
  * corpus; the per-batch wall of the deferred run should sit near the
  * no-store-attached floor (the gated batch's own classification /
  * index cost) and stay FLAT in N, while the immediate run carries
  * the corpus-sized tax every batch. */
object ProbeFoldTakedown {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val nDocs = sys.env.getOrElse("PFT_DOCS", "500000").toLong
    val corpus = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(12)),
          i => concat(lit("w"), pmod(col("id") * i * lit(2654435761L),
            lit(50000L))))).as("text"),
        concat(lit("l"), pmod(col("id"), lit(8))).as("lang"),
        concat(lit("s"), pmod(col("id"), lit(5))).as("source"),
        (pmod(col("id") * lit(37L), lit(4000L)) + 20L).as("n_chars"))
      .localCheckpoint()
    val nBatches = 5
    def takedown(k: Int) = corpus
      .filter(col("doc_id") % (nDocs / 100) === k) // ~100 docs per batch
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("source"),
        lit(null).cast("long").as("n_chars"))
      .localCheckpoint()
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-52s $s%7.1f s")
      s
    }
    // one mode per JVM (PFT_MODE=immediate|deferred) for clean
    // comparisons — the second universe in a shared JVM inherits the
    // first's cached blocks and GC pressure, which at 500k docs
    // swamped the effect being measured
    val modes = Seq(("immediate (refitBacklog=1)", 1),
      ("deferred (refitBacklog>N + one refresh)", 1000))
    val selected = sys.env.get("PFT_MODE") match {
      case Some("immediate") => modes.take(1)
      case Some("deferred") => modes.drop(1)
      case _ => modes
    }
    for ((mode, backlog) <- selected) {
      val tag = s"probe_ftd_$backlog"
      val idx = tag + "_idx"; val sig = tag + "_sigs"; val log = tag + "_log"
      val hll = tag + "_hll"; val hh = tag + "_hh"; val kll = tag + "_kll"
      val smp = tag + "_smp"
      IndexMaintenance.initStores(spark, idx)
      IngestDedup.initStore(spark, sig)
      graft.sources.Sinks.dropTable(spark, sig + "_pending_rm")
      for (t <- Seq(log, log + "_applied",
          hll + "_hll", hll + "_hll_params", hll + "_stale",
          hh + "_hh", hh + "_hh_n", hh + "_hh_params", hh + "_stale",
          kll + "_kll", kll + "_kll_params", kll + "_stale",
          smp + "_sample", smp + "_sample_params", smp + "_stale",
          smp + "_stale_ids", smp + "_layout"))
        graft.sources.Sinks.dropTable(spark, t)
      for (n <- Seq(log, hll, hh, kll, smp))
        CountStore.setBuilding(spark, n, on = false)
      val fold = IndexMaintenance.countStoreFold(spark,
        sketchStore = Some((hll, "lang")),
        hhStore = Some((hh, "source", 200)),
        quantileStore = Some((kll, "source", "n_chars")),
        sampleStore = Some((smp, "lang", "n_chars")), sampleK = 10,
        buckets = 32, refitBacklog = backlog)
      time(s"[$mode] bootstrap ${nDocs} docs") {
        IndexMaintenance.applyGatedUpserts(spark, idx, sig, corpus,
          ver = 1L, buckets = 32, docFold = Some((log, fold)))
      }
      var total = 0.0
      val liveReads0 = graft.streaming.CorpusLog.liveReads.get()
      val sliceMod = nDocs / 100
      var hitIds = List.empty[Long]
      for (k <- 1 to nBatches) {
        // make each batch HIT a sampled row (otherwise dropDocs'
        // group-pruned refit — and its live read — never fires and the
        // immediate mode undercounts the sample family's cost). The
        // row must be VERIFIED STILL LIVE (r13 advice, low): earlier
        // slices and earlier hit ids have already departed, and in
        // deferred mode the bit-still store still LISTS them — hitting
        // a departed id would silently void the premise. headOption +
        // loud message when the sample runs shallower than nBatches.
        // The lookup runs OUTSIDE the timed window.
        val live = graft.operators.SampleStore.sample(spark, smp)
          .filter(!(col("id") % sliceMod >= 1 && col("id") % sliceMod < k))
          .filter(if (hitIds.isEmpty) lit(true)
            else !col("id").isin(hitIds: _*))
          .orderBy(col("rank"), col("grp")).limit(1)
          .collect().headOption
        val hitId = live.map(_.getAs[Long]("id")).getOrElse(sys.error(
          s"[$mode] batch $k: no live sampled row left to hit — the " +
            s"sample is shallower than nBatches ($nBatches); raise " +
            "sampleK or lower nBatches"))
        hitIds ::= hitId
        val batch = takedown(k).unionByName(
          corpus.filter(col("doc_id") === hitId)
            .select(col("doc_id"), lit(null).cast("string").as("text"),
              lit(null).cast("string").as("lang"),
              lit(null).cast("string").as("source"),
              lit(null).cast("long").as("n_chars")))
          .distinct().localCheckpoint()
        total += time(s"[$mode] takedown batch $k (~100 docs + 1 sampled)") {
          IndexMaintenance.applyGatedUpserts(spark, idx, sig, batch,
            ver = k + 1L, buckets = 32, docFold = Some((log, fold)))
        }
      }
      if (backlog > 1)
        total += time(s"[$mode] refreshCountStores (settles all $nBatches)") {
          IndexMaintenance.refreshCountStores(spark, log,
            sketchStore = Some((hll, "lang")),
            hhStore = Some((hh, "source", 200)),
            quantileStore = Some((kll, "source", "n_chars")),
            sampleStore = Some((smp, "lang", "n_chars")))
        }
      println(f"[$mode] takedown phase total: $total%7.1f s")
      // the STRUCTURAL claim, steal-immune: live-corpus passes paid by
      // the takedown phase (bootstrap pays none in either mode)
      println(s"[$mode] live-corpus passes in takedown phase: " +
        (graft.streaming.CorpusLog.liveReads.get() - liveReads0))
    }
    spark.stop()
  }
}
