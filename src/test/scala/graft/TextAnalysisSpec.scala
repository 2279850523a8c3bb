package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("stripHtml: blocks drop wholesale, tags strip, entities decode once, malformed degrades safely") {
    import spark.implicits._
    val cases = Seq(
      // blocks removed with their content, inline tags stripped
      ("""<p>Hello <b>world</b></p><script>if (a<b) { x(); }</script>""",
        "Hello world"),
      ("""<style type="text/css">p { color: red }</style>body text""",
        "body text"),
      ("""<!-- a <b>comment</b> with tags -->kept""", "kept"),
      // entities decode exactly once: &amp;lt; is a LITERAL "&lt;"
      ("""a &lt;tag&gt; &amp; &amp;lt;not-a-tag&gt; &quot;q&quot; &#39;s&#39;""",
        """a <tag> & &lt;not-a-tag> "q" 's'"""),
      // unclosed / stray brackets: extra whitespace, never lost text
      ("""before <div unclosed after""", "before <div unclosed after"),
      ("""5 < 6 and 7 > 3""", "5 < 6 and 7 > 3"),
      // nbsp joins words with a plain space; whitespace squeezes
      ("""one&nbsp;two   three
          four""", "one two three four"))
    val got = cases.map(_._1).toDF("h")
      .select(graft.operators.TextAnalysis.stripHtml($"h")).as[String]
      .collect().toSeq
    got.lazyZip(cases.map(_._2)).foreach((g, e) => assert(g === e))
    // the SQL face serves the same chain (one source of semantics)
    GraftSession.registerFunctions(spark)
    cases.map(_._1).toDF("h").createOrReplaceTempView("strip_cases")
    val viaSql = spark.sql("SELECT strip_html(h) FROM strip_cases")
      .as[String].collect().toSeq
    assert(viaSql === got)
  }
  import spark.implicits._

  test("SQL faces equal the Column API: normalize_text/quality_score/language_id/redact_pii") {
    GraftSession.registerFunctions(spark)
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy with that thing there"),
      (2L, "mail me at a.b@ex.com or 10.1.2.3 or +1 555 0100 3456 now"),
      (3L, "café  x​yz   spaced")).toDF("doc_id", "text")
    df.createOrReplaceTempView("graft_sqlface_docs")
    val viaSql = spark.sql("""SELECT doc_id,
        normalize_text(text) AS n, quality_score(text) AS q,
        language_id(text) AS l, redact_pii(text) AS r
        FROM graft_sqlface_docs ORDER BY doc_id""").collect().toSeq
    val viaApi = df.select($"doc_id",
        TextAnalysis.normalizeText($"text").as("n"),
        TextAnalysis.qualityScore($"text").as("q"),
        TextAnalysis.languageId($"text").as("l"),
        TextAnalysis.redactPii($"text").as("r"))
      .orderBy($"doc_id").collect().toSeq
    assert(viaSql === viaApi)
    assert(viaSql(1).getString(4).contains("<EMAIL>") &&
      viaSql(1).getString(4).contains("<IP>"))
  }

  test("topNgramCharFraction: hand-checked coverage, deterministic tie, short docs drop") {
    val df = Seq(
      (1L, "a b a b a b"), // "a b"×3 beats "b a"×2; coverage 6/6
      (2L, "x y z"), // tie at cnt 1 → larger ngram string "y z" wins
      (3L, "solo"), // < 2 tokens → no bigram → dropped
      // the frequency-vs-coverage discriminator: "aa bb"×2 (most
      // frequent) must win over "longword1 longword2"×1 even though
      // the latter covers more chars (18 > 8) — Gopher's rule is the
      // MOST FREQUENT n-gram's coverage, not max coverage
      (4L, "aa bb aa bb longword1 longword2"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topNgramCharFraction(df, "doc_id", "text", n = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a b", 1.0), (2L, "y z", 0.666667),
      (4L, "aa bb", 0.307692))) // 2×4 / 26 token chars
    // companion rule: repeated-occurrence coverage, capped at 1
    val dup = TextAnalysis.dupNgramCharFraction(df, "doc_id", "text", n = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 1: "a b"×3 → 2 extra × 2 chars; "b a"×2 → 1 extra × 2 chars;
    // 6/6 = 1.0. doc 2: no repeats → 0.0. doc 4: one extra "aa bb" →
    // 4/26
    assert(dup.toSeq === Seq((1L, 1.0), (2L, 0.0), (4L, 0.153846)))
  }

  test("token/char counts and mean token length") {
    val df = Seq(("hello world foo", 1)).toDF("text", "id")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.meanTokenLen($"text")).head()
    assert(r.getInt(0) === 3)
    assert(math.abs(r.getDouble(1) - 13.0 / 3) < 1e-12)
  }

  test("punctuation ratio") {
    val df = Seq(Tuple1("ab,.!?cd")).toDF("text")
    val r = df.select(TextAnalysis.punctRatio($"text")).head().getDouble(0)
    assert(math.abs(r - 0.5) < 1e-12)
  }

  test("language ID picks the dominant stopword profile") {
    val df = Seq(
      (1, "the cat sat on the mat and it was happy with that"),
      (2, "el perro corre por la calle y se esconde en las casas"),
      (3, "der hund läuft durch die strasse und die katze auf dem dach"),
      (4, "zzz qqq xxx www")
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.languageId($"text").as("l"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) === "en")
    assert(got(2) === "es")
    assert(got(3) === "de")
    assert(got(4) === "und")
  }

  test("char-ngram language ID agrees with stopword ID on clear prose") {
    val df = Seq(
      (1, "the thing about the morning was that nothing was ending"),
      (2, "la canción de la nación estaba sonando en la habitación")
    ).toDF("id", "text")
    val got = df.select($"id",
      TextAnalysis.languageIdCharNgram($"text").as("l")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) === "en")
    assert(got(2) === "es")
  }

  test("quality score favors normal prose over garbage") {
    val good = "the engine reads data and writes results to the table " * 3
    val bad = "!!!???;;;"
    val df = Seq((1, good), (2, bad)).toDF("id", "text")
    val s = df.select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(s(1) > s(2))
    assert(s(1) === 1.0)
  }

  test("fingerprint: stable under formatting, sensitive to word order") {
    val df = Seq(
      (1, "Hello   World Foo"), (2, "hello world foo"), (3, "foo world hello")
    ).toDF("id", "text")
    val fp = df.select($"id", TextAnalysis.fingerprint($"text").as("f"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fp(1) === fp(2)) // case/whitespace-insensitive
    assert(fp(2) !== fp(3)) // order-sensitive
  }

  test("subword count exceeds word count for long words") {
    val df = Seq(Tuple1("internationalization")).toDF("text")
    val n = df.select(TextAnalysis.subwordCount($"text")).head().getInt(0)
    assert(n > 1)
  }

  test("dirty inputs (null / empty / whitespace text) never throw") {
    // a 100 TB corpus WILL contain nulls and junk rows; every text
    // operator must degrade (null/zero/'und'), not crash the stage
    import graft.operators.{Dedup, Multimodal, TextDedup}
    val dirty = Seq(
      (1L, null: String), (2L, ""), (3L, "   "), (4L, "ok text here"))
      .toDF("doc_id", "text")
    dirty.select(
      TextAnalysis.tokenCount($"text"), TextAnalysis.meanTokenLen($"text"),
      TextAnalysis.punctRatio($"text"), TextAnalysis.qualityScore($"text"),
      TextAnalysis.languageId($"text"), TextAnalysis.languageIdCharNgram($"text"),
      TextAnalysis.subwordCount($"text"), TextAnalysis.fingerprint($"text"),
      TextDedup.simhash($"text", 2)).collect()
    TextDedup.minhashPairs(dirty, "doc_id", "text", 3, 8, 4, 0.5).collect()
    TextDedup.jaccardPairsExact(dirty, "doc_id", "text", 3, 0.5).collect()
    assert(Dedup.stats(dirty, Seq("text")).head().getLong(0) === 4L)
    assert(Multimodal.decodeFeatures(Multimodal.asMediaTable(
      dirty.withColumn("source", lit("s")), "doc_id", "text", "source"))
      .count() === 4L)
  }

  test("redactPii tags emails, IPv4s, and phone runs; leaves prose alone") {
    val df = Seq(
      "mail me at jane.doe+spam@sub.example.co.uk please",
      "server 192.168.10.254 went down",
      "call +1 555 0134 9876 now",
      "version 2.5 of chapter 10 has 3 figures").toDF("text")
    val out = df.select(TextAnalysis.redactPii($"text")).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> please")
    assert(out(1) === "server <IP> went down")
    assert(out(2) === "call <PHONE> now")
    assert(out(3) === "version 2.5 of chapter 10 has 3 figures") // untouched
  }

  test("temperatureWeights: α=1 is the natural mix, lower α flattens, targets bounded") {
    import graft.operators.WeightedSample
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val nat = WeightedSample.temperatureWeights(docs, "lang", 1.0, 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val total = nat.values.map(_._1).sum.toDouble
    nat.foreach { case (l, (n, w, _)) =>
      assert(math.abs(w - n / total) < 1e-6, l)
    }
    val flat = WeightedSample.temperatureWeights(docs, "lang", 0.3, 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // flattening: the dominant group's share strictly shrinks, the
    // smallest group's share grows
    val big = nat.maxBy(_._2._1)._1; val small = nat.minBy(_._2._1)._1
    assert(flat(big) < nat(big)._2 && flat(small) > nat(small)._2)
    // floor targets never oversubscribe the sample
    assert(nat.values.map(_._3).sum <= 1000L)
  }

  test("qualityThresholdSweep: monotone non-increasing, complete at thr 0") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val rows = TextAnalysis.qualityThresholdSweep(docs, "text")
      .orderBy($"thr").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.head._1 === 0.0 && rows.head._2 === docs.count())
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 <= a._2 && b._3 <= a._3 })
    // every threshold reports, even zero-survivor ones
    assert(rows.length === 6)
  }

  test("piiMatches: typed occurrences, redaction precedence, prose stays silent") {
    val df = Seq(
      (1L, "mail jane.doe@example.co.uk and bob@x.org now"),
      (2L, "server 192.168.10.254 then call +1 555 0134 9876"),
      (3L, "version 2.5 of chapter 10 has 3 figures")).toDF("id", "t")
    val got = TextAnalysis.piiMatches(df, "id", "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.filter(_._1 == 1L).map(_._3).toSet ===
      Set("jane.doe@example.co.uk", "bob@x.org"))
    assert(got.filter(_._1 == 2L).toSet ===
      Set((2L, "ip", "192.168.10.254"), (2L, "phone", "+1 555 0134 9876")))
    assert(!got.exists(_._1 == 3L), "plain prose must produce no rows")
    // precedence: an email's digits never double-report as a phone
    val tricky = Seq((9L, "reach 12345678901@phish.net today")).toDF("id", "t")
    val hits = TextAnalysis.piiMatches(tricky, "id", "t").collect()
      .map(r => r.getString(1) -> r.getString(2))
    assert(hits.toSet === Set("email" -> "12345678901@phish.net"))
  }

  test("gopher filters: dup-line ratio, symbol ratio, alpha ratio, keep verdict") {
    val good = ("spark executes distributed dataframe pipelines with " +
      "catalyst optimizing every stage of the physical plan nicely")
    val repetitive = Array.fill(10)("buy now cheap deals").mkString("\n") +
      "\nbuy now cheap deals"
    val soup = "@#$% ^&*! ~~~~ ++++ <<<>>> {}{}[][] @#$% ^&*!"
    val df = Seq(good, repetitive, soup).toDF("text")
    val r = df.select(
      TextAnalysis.dupLineRatio($"text").as("dup"),
      TextAnalysis.symbolRatio($"text").as("sym"),
      TextAnalysis.alphaTokenRatio($"text").as("alpha"),
      TextAnalysis.gopherKeep($"text").as("keep")).collect()
    assert(r(0).getBoolean(3), "clean prose must pass")
    assert(r(1).getDouble(0) > 0.3 && !r(1).getBoolean(3), "template spam must fail on dup lines")
    assert(r(2).getDouble(1) > 0.2 && r(2).getDouble(2) === 0.0 && !r(2).getBoolean(3),
      "symbol soup must fail")
  }

  test("percentileFloor keeps each group's top (1-p); plan is agg+broadcast, no window") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5),
      ("b", 10), ("b", 20)).toDF("g", "v")
    val out = TextAnalysis.percentileFloor(df, "g", "v", 0.5)
    // p50(a) = 3 → keep {3,4,5}; p50(b) = 15 → keep {20}
    val kept = out.select("g", "v").as[(String, Int)].collect().toSet
    assert(kept === Set(("a", 3), ("a", 4), ("a", 5), ("b", 20)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), "the floor must not be a per-group window")
  }

  test("percentileFloorApprox: rank-bounded agreement with exact on skewed groups; same plan shape") {
    // skew = group CARDINALITY skew (the production hazard: exact
    // percentile's buffer grows with the 'en' slice). 20k distinct
    // values in the big group (37 coprime to 20000 → a permutation),
    // 10 in the small one.
    val big = (0 until 20000).map(i => ("en", (i * 37 % 20000).toDouble))
    val small = (0 until 10).map(i => ("de", i.toDouble))
    val df = (big ++ small).toDF("lang", "score")
    val exact = TextAnalysis.percentileFloor(df, "lang", "score", 0.9)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val approx = TextAnalysis.percentileFloorApprox(df, "lang", "score", 0.9,
        accuracy = 10000)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // GK rank guarantee: the sketch's threshold rank is within
    // n/accuracy of exact, so admitted counts differ by at most that
    // (+1 for the rank-interpolation boundary)
    for ((lang, n) <- Seq("en" -> 20000L, "de" -> 10L)) {
      val tol = n / 10000 + 1
      assert(math.abs(exact(lang) - approx(lang)) <= tol,
        s"$lang: exact=${exact(lang)} approx=${approx(lang)} tol=$tol")
    }
    // coarse sketch still yields a sound floor (subset of the input,
    // nonempty) — degraded precision, never corruption
    val coarse = TextAnalysis.percentileFloorApprox(df, "lang", "score", 0.9,
      accuracy = 1)
    assert(coarse.count() > 0 && coarse.count() <= df.count())
    // identical scale shape: agg + broadcast threshold, no window
    val plan = TextAnalysis.percentileFloorApprox(df, "lang", "score", 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), "the approx floor must not be a window either")
  }

  test("heavyHittersChecked: exact counts, sketch never undercounts, bound holds") {
    // zipf-ish synthetic: token t_i appears (40 - i) times
    val words = (0 until 30).flatMap(i => Seq.fill(40 - i)(s"t$i"))
    val docs = words.grouped(25).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.heavyHittersChecked(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.length === 10)
    // exact truth: t0..t9 with counts 40..31, descending
    assert(out.map(_._1).toSeq === (0 until 10).map(i => s"t$i"))
    assert(out.map(_._2).toSeq === (40L to 31L by -1L))
    out.foreach { case (t, _, ok) => assert(ok === 1, s"cms bound violated for $t") }
    // even a COARSE sketch (eps=0.1: bound = 0.1*N) never undercounts
    val coarse = TextAnalysis.heavyHittersChecked(docs, "text", k = 10, eps = 0.1)
      .collect().map(r => r.getInt(2))
    assert(coarse.forall(_ === 1))
  }

  test("compressionRatio: repetitive text compresses far below prose; deterministic") {
    val docs = Seq(
      (1L, "the " * 500),                                         // degenerate repetition
      (2L, "The quick brown fox jumps over the lazy dog. " +
        "Pack my box with five dozen liquor jugs. " +
        "Sphinx of black quartz, judge my vow. " * 5),            // prose-ish
      (3L, ""),                                                   // empty -> 0
      (4L, (0 until 400).map(i => (i * 2654435761L).toHexString).mkString(" "))
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < 0.05, s"pure repetition must crush: ${out(1L)}")
    assert(out(2L) < 0.6, s"repeated prose compresses well: ${out(2L)}")
    assert(out(4L) > out(1L) * 5, "hex noise compresses far worse than repetition")
    assert(out(3L) === 0.0)
    val again = docs.select(TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(again === docs.select(TextAnalysis.compressionRatio(col("text")))
      .collect().map(_.getDouble(0)).toSeq)
  }

  test("distinctChecked: HLL bound and mergeability bits hold; exact counts are exact") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val out = TextAnalysis.distinctChecked(docs, "lang", "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getInt(3))).toMap
    assert(out.nonEmpty)
    out.foreach { case (g, (exact, hllOk, mergeOk)) =>
      assert(exact > 0, g)
      assert(hllOk === 1, s"$g: estimate outside the error bound")
      assert(mergeOk === 1, s"$g: union of halves != one-shot sketch")
    }
    // exactness of the exact lane against a hand count
    val hand = docs.select($"lang",
        explode(split(lower(trim($"text")), "\\s+")).as("t"))
      .filter(length($"t") > 0)
      .collect().groupBy(_.getString(0)).map { case (g, rows) =>
        g -> rows.map(_.getString(1)).distinct.length.toLong }
    hand.foreach { case (g, n) => assert(out(g)._1 === n, g) }
  }

  test("quantileBuckets: monotone in value, covers 1..n, ties share a bucket, no window") {
    val df = (1 to 100).map(i => (i.toLong, (i % 10).toLong))
      .toDF("id", "v") // heavy ties: values 0..9 × 10 each
    val out = TextAnalysis.quantileBuckets(df, "v", n = 5)
    val rows = out.collect().map(r => (r.getLong(1), r.getInt(2)))
    // same value → same bucket, monotone mapping, full 1..n coverage
    val byV = rows.groupBy(_._1).map { case (v, rs) => v -> rs.map(_._2).toSet }
    assert(byV.values.forall(_.size == 1), "ties must share a bucket")
    val mapping = byV.map { case (v, b) => v -> b.head }.toSeq.sortBy(_._1)
    assert(mapping.map(_._2) === mapping.map(_._2).sorted)
    assert(mapping.map(_._2).min === 1 && mapping.map(_._2).max === 5)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "bucketing must not be a corpus-wide window")
  }

  test("normalizeText: NFC composes, zero-widths vanish, controls become spaces, runs collapse") {
    val cases = Seq(
      ("cafe\u0301", "caf\u00e9"), // NFC composition
      ("a\u200Bb\u200Cc\u200Dd\uFEFFe", "abcde"), // zero-widths removed, no space left
      ("ab\tc\nd", "ab c d"), // C0 controls \u2192 single spaces
      ("  a   b  ", "a b"), // collapse + trim
      ("", ""))
    val out = cases.zipWithIndex.map { case ((in, _), i) => (i, in) }
      .toDF("i", "t")
      .select($"i", TextAnalysis.normalizeText($"t").as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(out(i) === want, s"input ${in.map(_.toInt).mkString(",")}")
    }
    // null passes through
    val n = Seq((1, null: String)).toDF("i", "t")
      .select(TextAnalysis.normalizeText($"t")).head()
    assert(n.isNullAt(0))
    // idempotent: normalizing twice is a no-op
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val once = docs.select($"doc_id", TextAnalysis.normalizeText($"text").as("n1"))
    val twice = once.select($"doc_id", TextAnalysis.normalizeText($"n1").as("n2"))
    assert(once.join(twice, "doc_id").filter($"n1" =!= $"n2").count() === 0L)
  }

  test("NB classifier: hand-computed add-one likelihoods on a two-doc corpus") {
    // doc 1 (y=1): "a a b"; doc 2 (y=0): "b c". V=3, t1=3, t0=2, n1=n0=1
    val docs = Seq((1L, "a a b", 1), (2L, "b c", 0)).toDF("doc_id", "text", "y")
    val out = TextAnalysis.nbClassifierScores(docs, "doc_id", "text", $"y" === 1)
      .orderBy($"doc_id").collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pri = math.log(0.5)
    val s1d1 = r6(pri + 2 * math.log(3.0 / 6) + math.log(2.0 / 6))
    val s0d1 = r6(pri + 2 * math.log(1.0 / 5) + math.log(2.0 / 5))
    val s1d2 = r6(pri + math.log(2.0 / 6) + math.log(1.0 / 6))
    val s0d2 = r6(pri + math.log(2.0 / 5) + math.log(2.0 / 5))
    assert(out(0).getDouble(1) === s1d1 && out(0).getDouble(2) === s0d1)
    assert(out(1).getDouble(1) === s1d2 && out(1).getDouble(2) === s0d2)
    // each training doc classifies to its own label; pred follows the
    // rounded comparison
    assert(out(0).getInt(3) === 1 && out(1).getInt(3) === 0)
  }

  test("stripBoilerplate: separator, token-floor and stopword rules, hand-checked") {
    import spark.implicits._
    val page = Seq(
      "Home | About | Contact",                       // separator → drop
      "Search",                                       // 1 token → drop
      "the cat sat on the mat today",                 // 7 toks, 3/7 sw → keep
      "quick brown fox jumps over lazy dog",          // 7 toks, 0/7 sw → drop
      "it is a good day for the team to play",        // 10 toks, 6/10 → keep
      "Copyright 2026 Example Corp All rights reserved" // 0 sw → drop
    ).mkString("\n")
    val got = Seq(page).toDF("t")
      .select(TextAnalysis.stripBoilerplate($"t")).as[String].head()
    assert(got === "the cat sat on the mat today\nit is a good day for the team to play")
    // all-boilerplate page → empty string, not null
    val empty = Seq("Home | About\nSearch").toDF("t")
      .select(TextAnalysis.stripBoilerplate($"t")).as[String].head()
    assert(empty === "")
    // thresholds are parameters
    val loose = Seq(page).toDF("t")
      .select(TextAnalysis.stripBoilerplate($"t", minTokens = 5,
        minStopwordRatio = 0.0)).as[String].head()
    assert(loose.split("\n").length === 4) // fox + copyright lines now pass
    // the SQL face serves the same rule chain (one source of semantics)
    GraftSession.registerFunctions(spark)
    Seq(page).toDF("t").createOrReplaceTempView("bp_cases")
    val viaSql = spark.sql("SELECT strip_boilerplate(t) FROM bp_cases")
      .as[String].head()
    assert(viaSql === got)
  }

  test("NB classifier: full-corpus shape — one row per doc, token-less docs prior-only") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val withEmpty = docs.select($"doc_id", $"text", $"lang")
      .union(Seq((999999L, "   ", "xx")).toDF("doc_id", "text", "lang"))
    val out = TextAnalysis.nbClassifierScores(
      withEmpty, "doc_id", "text", $"lang" === "en")
    assert(out.count() === docs.count() + 1)
    val empty = out.filter($"doc_id" === 999999L).head()
    // prior-only score: ln(n1/n) and ln(n0/n) with this corpus' priors
    val n = docs.count().toDouble + 1
    val n1 = docs.filter($"lang" === "en").count().toDouble
    assert(empty.getDouble(1) ===
      BigDecimal(math.log(n1 / n)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("collocations: hand-computed PMI over bigram margins, tie-broken by pair") {
    // "a b a b c c": cb ab=2 ba=1 bc=1 cc=1, T=5;
    // c1 a=2 b=2 c=1; c2 a=1 b=2 c=2
    val df = Seq((1L, "a b a b c c")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(df, "text", minCount = 1L, topK = 10)
      .collect().map(r => (r.getInt(4), r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // ab: ln(2·5/(2·2)); ba: ln(5/(2·1)); cc: ln(5/(1·2)) — all ln 2.5,
    // tie → pair order; bc: ln(5/(2·2)) last
    assert(got.toSeq === Seq(
      (1, "a", "b", 2L, r4(math.log(2.5))),
      (2, "b", "a", 1L, r4(math.log(2.5))),
      (3, "c", "c", 1L, r4(math.log(2.5))),
      (4, "b", "c", 1L, r4(math.log(1.25)))))
    // the min-count floor kills the hapax pairs
    assert(TextAnalysis.collocations(df, "text", minCount = 2L, topK = 10)
      .count() === 1L)
  }
}
