package graft.tools

import org.apache.spark.sql.functions._

/** ProbeR15 extension (round-11 verdict #4): quantify the
  * PREFIX-PRUNED model-table rewrite. ProbeR15 showed delta merges
  * flat in the CORPUS; their cost was still the full MODEL rewrite
  * per wave. Layout v2 partitions the model on a token-hash prefix
  * (P=1024 here) so a merge rewrites only delta-touched partitions.
  *
  * The honest geometry (measured below, not assumed): a delta
  * touching D distinct keys hits ~P·(1−(1−1/P)^D) partitions, so the
  * win is the TRICKLE regime — takedowns, small upserts, id-keyed
  * models where D ≪ P. A bulk text wave (thousands of distinct
  * tokens, Zipf or not) saturates the prefixes and degrades to the
  * full rewrite — the caveat ProbeR15 predicted for Zipf-common
  * tokens turns out to bind for ANY many-key delta. Both regimes are
  * timed against the plain layout; each store gets one untimed
  * warm-up merge so JIT/shuffle-service effects don't masquerade as
  * layout costs. */
object ProbeR15X {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    // phase filter: no args = all phases; "nb" / "big" / "hh" select one
    val phases: Set[String] =
      if (args.isEmpty) Set("nb", "big", "hh") else args.toSet
    def synth(n: Long, off: Long, universe: Long) = {
      spark.range(n)
        .select((col("id") + off).as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(20)),
            i => concat(lit("w"),
              floor(pow(pmod((col("id") + off) * i * lit(40503L),
                lit(2147483647L)).cast("double") / 2147483647.0, 4.0)
                * universe).cast("long")))).as("text"),
          concat(lit("c"), pmod(col("id") + off, lit(4))).as("label"))
        .localCheckpoint()
    }
    val n = 2000000L
    // deltas on a DISJOINT tail key space sized to sweep the touched-
    // prefix fraction: 5 docs ≈ 100 keys (~10% of P), 50 docs ≈ 1k
    // keys (~60%), 2000 docs ≈ 40k keys (saturated)
    def tailDelta(docs: Long) = spark.range(docs)
      .select((col("id") + n).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(20)),
          i => concat(lit("rare"), (col("id") * lit(100) + i)))).as("text"),
        concat(lit("c"), pmod(col("id"), lit(4))).as("label"))
      .localCheckpoint()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }
    def touched(delta: org.apache.spark.sql.DataFrame, p: Int): Long =
      delta.select(explode(split(col("text"), " ")).as("token"))
        .select(graft.operators.CountStore.pfxCol("token", p)).distinct().count()
    if (phases("nb")) {
    val P = 1024
    val corpus = synth(n, 0L, 2000000L)
    for ((layout, pfx) <- Seq(("plain", 0), (s"prefixed P=$P", P))) {
      val name = s"probe_r15x_${pfx}"
      for (t <- Seq(s"${name}_counts", s"${name}_class", s"${name}_layout",
          s"${name}_applied"))
        graft.sources.Sinks.dropTable(spark, t)
      graft.operators.CountStore.setBuilding(spark, name, on = false)
      time(s"[$layout] init 2M docs") {
        graft.operators.NbStore.initStore(corpus, name, prefixes = pfx)
      }
      println(s"[$layout] model rows: " +
        spark.table(s"${name}_counts").count())
      // untimed warm-up merge (JIT, shuffle service)
      graft.operators.NbStore.appendDocs(tailDelta(1), name)
      for (docs <- Seq(5L, 50L, 2000L)) {
        val d = tailDelta(docs)
        val t = if (pfx > 0) s" (touches ${touched(d, P)}/$P prefixes)" else ""
        time(s"[$layout] append $docs tail docs$t") {
          graft.operators.NbStore.appendDocs(d, name)
        }
        time(s"[$layout] remove them again") {
          graft.operators.NbStore.removeDocs(d, name)
        }
      }
    }
    }
    if (phases("big")) {
    // phase 2 — the crossover: a model big enough that REWRITE BYTES
    // dominate file overhead (15M docs -> ~4·10^7 count rows), P sized
    // so partitions are MBs not KBs, and a single-doc takedown (the
    // trickle regime the lever exists for). Run with
    // SPARK_DRIVER_MEM=48g — the default 8g heap OOMs the init agg.
    val P2 = 128
    val big = synth(15000000L, 0L, 30000000L)
    val one = tailDelta(1)
    val fifty = tailDelta(50)
    for ((layout, pfx) <- Seq(("plain", 0), (s"prefixed P=$P2", P2))) {
      val name = s"probe_r15x_big_${pfx}"
      for (t <- Seq(s"${name}_counts", s"${name}_class", s"${name}_layout",
          s"${name}_applied"))
        graft.sources.Sinks.dropTable(spark, t)
      graft.operators.CountStore.setBuilding(spark, name, on = false)
      time(s"[big $layout] init 15M docs") {
        graft.operators.NbStore.initStore(big, name, prefixes = pfx)
      }
      println(s"[big $layout] model rows: " +
        spark.table(s"${name}_counts").count())
      graft.operators.NbStore.appendDocs(tailDelta(2), name) // warm-up
      val t1 = if (pfx > 0) s" (touches ${touched(one, P2)}/$P2)" else ""
      time(s"[big $layout] append 1 doc$t1") {
        graft.operators.NbStore.appendDocs(one, name)
      }
      time(s"[big $layout] remove 1 doc") {
        graft.operators.NbStore.removeDocs(one, name)
      }
      val t50 = if (pfx > 0) s" (touches ${touched(fifty, P2)}/$P2)" else ""
      time(s"[big $layout] append 50 docs$t50") {
        graft.operators.NbStore.appendDocs(fifty, name)
      }
    }
    }
    if (phases("hh")) {
    // phase 3 (round-12): the v2 layout reaching the GRP-KEYED sketch
    // families — an HhStore tracking many domains where each wave
    // touches FEW. 50k groups × ~40 counters; a one-group wave should
    // read+rewrite ~1/P of the model under v2 and all of it plain.
    val P3 = 64
    val groups = 50000L
    val hhBase = spark.range(groups * 40)
      .select(concat(lit("dom"), pmod(col("id"), lit(groups))).as("grp"),
        concat(lit("w"), pmod(col("id") * lit(2654435761L),
          lit(200000L))).as("item"))
      .localCheckpoint()
    val oneGrpWave = spark.range(500)
      .select(lit("dom123").as("grp"),
        concat(lit("w"), pmod(col("id") * lit(7919L), lit(200000L))).as("item"))
      .localCheckpoint()
    for ((layout, pfx) <- Seq(("plain", 0), (s"prefixed P=$P3", P3))) {
      val name = s"probe_r15x_hh_${pfx}"
      for (t <- Seq(s"${name}_hh", s"${name}_hh_n", s"${name}_hh_params",
          s"${name}_layout", s"${name}_applied", s"${name}_stale"))
        graft.sources.Sinks.dropTable(spark, t)
      graft.operators.CountStore.setBuilding(spark, name, on = false)
      time(s"[hh $layout] init ${groups} groups") {
        graft.operators.HhStore.initStore(hhBase, name, "grp", "item",
          k = 20, prefixes = pfx)
      }
      graft.operators.HhStore.mergeDocs(oneGrpWave, name, "grp", "item") // warm-up
      time(s"[hh $layout] one-group wave (1/$P3 of prefixes)") {
        graft.operators.HhStore.mergeDocs(oneGrpWave, name, "grp", "item")
      }
    }
    }
    spark.stop()
  }
}
