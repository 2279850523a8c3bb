package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data pipelines — all Catalyst
  * built-ins (regexp / split / filter / aggregate), fully codegen'd,
  * no shuffle: every metric is a narrow per-row projection.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation
    * counted separately (a cheap deterministic proxy for a tokenizer's
    * token count — the usual pretraining-cost estimator). */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])|(?<=[a-z]{4})(?=[a-z])"))

  /** Ratio of punctuation characters to all characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text).cast("double"))

  /** Ratio of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordRatioT(tokens(text), stopwords)

  /** As [[stopwordRatio]], over a pre-tokenized column — HOF expressions
    * are CodegenFallback with no common-subexpression elimination, so a
    * caller computing several token metrics should materialize
    * `tokens(text)` once and use the `…T` variants. */
  def stopwordRatioT(toks: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks).cast("double"))
  }

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = meanTokenLenT(tokens(text))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Composite quality score in [0,1]: length band + stopword presence
    * − punctuation excess (heuristic C4/Gopher-style filters). */
  def qualityScore(text: Column): Column =
    qualityFromMetrics(
      tokenCount(text), stopwordRatio(text, defaultStopwords), punctRatio(text))

  /** The quality formula over already-computed metrics — callers that
    * also emit the metrics should feed their columns in, not re-derive
    * (each `…Ratio(text)` re-expands the tokenization). */
  def qualityFromMetrics(nTok: Column, swRatio: Column, pRatio: Column): Column = {
    val lenOk = when(nTok.between(10, 10000), 1.0).otherwise(0.0)
    val swOk = when(swRatio >= 0.01, 1.0).otherwise(0.0)
    val punctOk = when(pRatio <= 0.2, 1.0).otherwise(0.0)
    (lenOk * 0.4 + swOk * 0.3 + punctOk * 0.3)
  }

  /** Language ID by stopword-profile voting: score per language =
    * fraction of tokens in that language's closed-class word list;
    * argmax, "und" when nothing matches. N-gram-profile heuristics in
    * the same spirit as published langid approaches; list-driven so it
    * stays a pure Catalyst expression.
    */
  val languageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "que", "est"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich", "des", "auf"),
    "pt" -> Seq("de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "com", "uma"))

  def languageId(text: Column): Column = languageIdT(tokens(text))

  /** As [[languageId]], over a pre-tokenized column. */
  def languageIdT(toks: Column): Column = {
    val scores = languageProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val sw = array(words.map(lit): _*)
      struct(
        (size(filter(toks, t => array_contains(sw, t))).cast("double")
          / greatest(size(toks), lit(1)).cast("double")).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0.0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Character-trigram language profiles (top distinctive trigrams per
    * language, with spaces marking word boundaries) — the classic
    * n-gram-profile heuristic; complements the stopword vote for text
    * where function words are rare (short strings, hashtags). */
  private val charProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "ing", "and", " th", "ion", "ent", " of", "ed "),
    "es" -> Seq(" de", "os ", " la", "ión", "ent", "ado", " el", "que"),
    "fr" -> Seq(" de", "es ", " le", "ent", "ion", " la", "eur", "que"),
    "de" -> Seq("en ", "er ", "ch ", " de", "ein", "sch", "die", "und"),
    "pt" -> Seq(" de", "os ", "ão ", " co", "ent", "ada", " se", "que"))

  def languageIdCharNgram(text: Column): Column = {
    val t = concat(lit(" "), lower(trim(text)), lit(" "))
    val scores = charProfiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val hits = grams.map(g =>
        (length(t) - length(regexp_replace(t, java.util.regex.Pattern.quote(g), ""))) / g.length)
      struct(
        hits.reduce(_ + _).cast("double").as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0.0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Document fingerprint: 64-bit rolling hash of the normalized token
    * stream (hash-chain fold — order-sensitive, so it's a
    * whitespace/case-insensitive exact-dup key, stable across
    * formatting changes). aggregate() keeps it codegen'd; xxhash64
    * chaining avoids ANSI-mode overflow that a polynomial hash's
    * wrapping multiply would trip.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text), lit(1469598103934665603L),
      (acc, t) => xxhash64(acc, t))

  // ---- PII redaction (pre-training scrub) ----
  //
  // Deliberately dialect-neutral regexes (no lookarounds, no \p
  // classes) so the same patterns run under Java regex (Spark) and RE2
  // (DuckDB oracle) with identical semantics. Order matters: emails
  // first (the phone pattern must not eat an address's digit runs),
  // IPs before phones (dots already break the phone run, but explicit
  // order keeps the result independent of pattern-overlap accidents).
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+?\\d[\\d ]{7,}\\d"

  /** Replace emails / IPv4s / phone-like digit runs with typed tags.
    * Narrow, codegen'd regexp_replace chain — a write-once projection
    * at scale, like the quantization encodes. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** PII AUDIT — the extraction face of [[redactPii]]: one row per
    * occurrence, (idCol, pii_type, hit). Compliance pipelines need the
    * inventory (what leaked, where, how often) before and after the
    * scrub; redaction alone can't answer that. Same dialect-neutral
    * patterns, and the SAME precedence as redaction — emails are
    * extracted from raw text, IPs from email-redacted text, phones
    * from IP-redacted text — so an address's digit runs can never
    * double-report as a phone. ONE scan: the three typed match arrays
    * are computed in a single projection (each redaction stage feeds
    * the next) and exploded from one stacked array — a union of
    * per-type selects would read the corpus three times and re-run the
    * upstream redaction chain per branch. */
  def piiMatches(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val t1 = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, ipv4Re, "<IP>")
    def tagged(ty: String, src: Column, re: String): Column =
      transform(regexp_extract_all(src, lit(re), lit(0)),
        m => struct(lit(ty).as("pii_type"), m.as("hit")))
    df.select(col(idCol),
        explode(concat(
          tagged("email", col(textCol), emailRe),
          tagged("ip", t1, ipv4Re),
          tagged("phone", t2, phoneRe))).as("kv"))
      .select(col(idCol), col("kv.pii_type").as("pii_type"),
        col("kv.hit").as("hit"))
  }

  // ---- Repetition / shape filters (Gopher-style quality rules) ----

  /** Non-empty lines of a document. */
  def docLines(text: Column): Column =
    filter(split(text, "\n"), l => length(l) > 0)

  /** Fraction of lines that are duplicates of an earlier line —
    * 1 − distinct/total (0 for ≤1 line). Boilerplate/template pages
    * score high. */
  def dupLineRatio(text: Column): Column = dupLineRatioT(docLines(text))

  /** Fraction of characters outside [A-Za-z0-9 ] — markup/symbol soup
    * detector. */
  def symbolRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
        .cast("double") / length(text))

  /** Fraction of tokens containing at least one ASCII letter. */
  def alphaTokenRatio(text: Column): Column = alphaTokenRatioT(tokens(text))

  /** [[alphaTokenRatio]] over a materialized token array — see the
    * `…T` convention (stopwordRatioT): HOFs are CodegenFallback with no
    * CSE, so hot callers tokenize once and pass the alias. */
  def alphaTokenRatioT(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / size(toks))

  /** [[dupLineRatio]] over a materialized non-empty-line array. */
  def dupLineRatioT(ls: Column): Column =
    when(size(ls) <= 1, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))

  /** [[meanTokenLen]] over a materialized token array. */
  def meanTokenLenT(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))

  /** Gopher's top-n-gram repetition rule — the one repetition filter
    * [[dupLineRatio]] doesn't see: a document that repeats one phrase
    * inside long lines scores 0 on line-dedup but high here. Per doc:
    * the most frequent word n-gram (ties broken by the n-gram string —
    * deterministic, SQL-mirrorable) and the fraction of the document's
    * token characters its occurrences cover
    * (count × token-chars-of-the-ngram / Σ token chars). Gopher drops
    * docs above per-n thresholds (0.20 for 2-grams, 0.18 for 3-grams,
    * 0.16 for 4-grams).
    *
    * Scale shape: one n-gram explode, a (doc, ngram) partial-agg
    * count, an argmax as max-of-struct per doc (partial-agg, no
    * window), one id-keyed join with the per-doc char totals. Docs
    * with fewer than n tokens have no n-gram and drop (a 0-row is
    * noise — they cannot be phrase-repetitive). */
  def topNgramCharFraction(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be at least 1")
    val t = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val totals = t.select(col(idCol),
      aggregate(col("__toks"), lit(0L), (a, x) => a + length(x)).as("__chars"))
    val ngs = t.select(col(idCol), explode(
        when(size(col("__toks")) >= n,
          transform(sequence(lit(0), size(col("__toks")) - n),
            i => array_join(slice(col("__toks"), i + lit(1), lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("ng"))
    // argmax by FREQUENCY (Gopher's published rule — the winner is the
    // most frequent n-gram, not the max-coverage one; a rarer-but-
    // longer phrase must not displace it), ties broken by the n-gram
    // string; the coverage fraction is then computed FROM the winner
    val top = ngs.groupBy(col(idCol), col("ng"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(idCol), struct(col("cnt"), col("ng")).as("s"))
      .groupBy(col(idCol)).agg(max(col("s")).as("s"))
    top.join(totals, idCol)
      .select(col(idCol), col("s.ng").as("top_ngram"),
        round(when(col("__chars") > 0,
          (col("s.cnt") * (length(col("s.ng")) - lit(n - 1))).cast("double")
            / col("__chars"))
          .otherwise(lit(0.0)), 6).as("top_ngram_char_frac"))
  }

  /** The companion Gopher repetition rule to [[topNgramCharFraction]]:
    * the fraction of a doc's token characters covered by REPEATED
    * n-gram occurrences — every occurrence beyond the first of each
    * n-gram contributes its token-char length, capped at 1 (the
    * overlap-free approximation of the published "characters in
    * duplicate n-grams" rule — occurrences can overlap in text, which
    * an interval-merge would de-overlap; the cap keeps the statistic a
    * fraction and the whole path one explode + two partial aggs, and
    * the approximation only ever OVER-counts, so a keep/drop threshold
    * stays conservative). Same drop-short-docs convention as the
    * top-n-gram rule. */
  def dupNgramCharFraction(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be at least 1")
    val t = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val totals = t.select(col(idCol),
      aggregate(col("__toks"), lit(0L), (a, x) => a + length(x)).as("__chars"))
    val ngs = t.select(col(idCol), explode(
        when(size(col("__toks")) >= n,
          transform(sequence(lit(0), size(col("__toks")) - n),
            i => array_join(slice(col("__toks"), i + lit(1), lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("ng"))
    val dup = ngs.groupBy(col(idCol), col("ng"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(coalesce(sum(when(col("cnt") >= 2,
          (col("cnt") - 1) * (length(col("ng")) - lit(n - 1)))), lit(0L))
        .as("__dup_chars"))
    dup.join(totals, idCol)
      .select(col(idCol),
        round(when(col("__chars") > 0,
          least(lit(1.0), col("__dup_chars").cast("double") / col("__chars")))
          .otherwise(lit(0.0)), 6).as("dup_ngram_char_frac"))
  }

  /** Gopher keep/drop from PRE-COMPUTED metric columns (the scale
    * form — one tokenization, one line split per row; q68 shape).
    * The phrase-level repetition rules ([[topNgramCharFraction]],
    * [[dupNgramCharFraction]] — per-doc AGGREGATIONS, not per-row
    * expressions) compose on top: join their outputs and AND e.g.
    * `top_ngram_char_frac <= 0.20 && dup_ngram_char_frac <= 0.20`
    * into this keep column. */
  def gopherKeepFromMetrics(
      nTok: Column, meanLen: Column, symRatio: Column,
      dupRatio: Column, alphaRatio: Column,
      minTokens: Int = 10, maxTokens: Int = 100000): Column =
    nTok.between(minTokens, maxTokens) &&
      meanLen.between(1.0, 12.0) &&
      symRatio <= 0.2 &&
      dupRatio <= 0.3 &&
      alphaRatio >= 0.8

  /** Gopher-style keep/drop: token count in range, words look like
    * words, not symbol soup, not line-repetitive. Thresholds are the
    * published Gopher rules' shape, tunable per corpus. Convenience
    * form — re-expands the tokenization per metric; hot paths
    * materialize tokens/lines once and use [[gopherKeepFromMetrics]]. */
  def gopherKeep(text: Column,
      minTokens: Int = 10, maxTokens: Int = 100000): Column =
    gopherKeepFromMetrics(
      tokenCount(text), meanTokenLen(text), symbolRatio(text),
      dupLineRatio(text), alphaTokenRatio(text), minTokens, maxTokens)

  /** Per-group quality floor: keep rows whose `valueCol` is at or above
    * the group's p-th percentile — "top (1−p) of each language by LM
    * score", the stratified selection step after quality scoring
    * (per-language floors stop high-resource languages from crowding
    * out the rest, CCNet-style).
    *
    * Scale shape: the floor is a per-group AGGREGATION (linear-
    * interpolated `percentile`, distributed partial buffers) broadcast
    * back as one tiny threshold table — NOT a per-group window, which
    * would sort each group in one task and die on a corpus-scale 'en'
    * partition. */
  def percentileFloor(df: org.apache.spark.sql.DataFrame,
      groupCol: String, valueCol: String, p: Double)
      : org.apache.spark.sql.DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile must be in [0,1], got $p")
    val thr = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $p)").as("__thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(valueCol) >= col("__thr"))
      .drop("__thr")
  }

  /** [[percentileFloor]] at corpus scale: exact `percentile` holds
    * EVERY group value in its aggregation buffer (OpenHashMap of value
    * → count — fine at fixture scale, linear in group cardinality on a
    * 100 TB 'en' slice), so this variant swaps in `approx_percentile`
    * (Greenwald-Khanna sketch, buffer bounded by O(accuracy) regardless
    * of group size). Identical plan shape — per-group agg broadcast
    * back as a threshold, never a window.
    *
    * Error bound (the GK guarantee surfaced by Spark docs): the sketch
    * returns a value whose RANK is within n/accuracy of the exact
    * p·n-th rank — a rank-ε guarantee, not a value-ε one, so the floor
    * admits/rejects at most n/accuracy rows per group more or fewer
    * than the exact filter (TextAnalysisSpec pins exact-vs-approx
    * agreement within that bound on a skewed corpus). accuracy=10000
    * (Spark's default) bounds the buffer at a few hundred KB per group
    * while mis-ranking ≤ 0.01% of rows. */
  def percentileFloorApprox(df: org.apache.spark.sql.DataFrame,
      groupCol: String, valueCol: String, p: Double,
      accuracy: Int = 10000): org.apache.spark.sql.DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile must be in [0,1], got $p")
    require(accuracy >= 1, s"accuracy must be positive, got $accuracy")
    val thr = df.groupBy(col(groupCol))
      .agg(expr(s"approx_percentile($valueCol, $p, $accuracy)").as("__thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(valueCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Exact top-k heavy-hitter tokens CROSS-CHECKED by a count-min
    * sketch — the sketch discipline for corpus-scale frequency
    * estimation (Cormode & Muthukrishnan 2005; Spark's built-in
    * `stat.countMinSketch` merges per-partition sketches, so the
    * sketch pass is one narrow scan + a driver-side merge of
    * O(1/eps·log(1/δ)) counters, no token shuffle at all). At fixture
    * scale the exact top-k (heap-pruned TakeOrderedAndProject over the
    * token histogram) is cheap and serves as truth; the `cms_ok`
    * column pins the sketch's guarantee on every returned row —
    * true ≤ estimate ≤ true + eps·N with probability 1−δ, and the
    * estimate NEVER undercounts — so the hash gate covers both the
    * exact path and the sketch's error contract. At 100 TB the roles
    * flip: the sketch (plus a small candidate heap) replaces the exact
    * histogram as the serving path and this function is its regression
    * oracle. */
  def heavyHittersChecked(docs: org.apache.spark.sql.DataFrame,
      textCol: String, k: Int, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val toks = graft.GraftSession.widen(docs)
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val cms = toks.stat.countMinSketch("token", eps, confidence, seed)
    // N comes from the sketch itself (totalCount = rows added), not a
    // second corpus scan
    val bound = math.ceil(eps * cms.totalCount()).toLong
    val estimate = udf { (t: String) => cms.estimateCount(t) }
    toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("__est", estimate(col("token")))
      .withColumn("cms_ok",
        (col("__est") >= col("cnt") && col("__est") <= col("cnt") + bound).cast("int"))
      .select(col("token"), col("cnt"), col("cms_ok"))
  }

  /** Per-group EXACT distinct-token counts CROSS-CHECKED by mergeable
    * HLL sketches (Apache DataSketches via Spark's `hll_sketch_agg`) —
    * the cardinality discipline at 100 TB, where exact distinct is a
    * full shuffle of every token but a sketch is a few KB per group,
    * mergeable across partitions, days, and datacenters. Two checked
    * bits per group row:
    *   - `hll_ok`: the sketch estimate is within `relErr` of the exact
    *     count (lgK=12 gives ~1.6% standard error; the default bound
    *     leaves ~3σ headroom);
    *   - `merge_ok`: sketching two disjoint halves (split by id
    *     parity) and UNIONING equals sketching everything at once —
    *     the mergeability property that makes sketches incremental
    *     (DataSketches unions are deterministic on the same inputs).
    * At fixture scale exact is cheap and serves as truth; at corpus
    * scale the roles flip and this is the sketch's regression oracle
    * (the q128 count-min pattern, applied to cardinality). */
  def distinctChecked(docs: org.apache.spark.sql.DataFrame,
      groupCol: String, idCol: String, textCol: String,
      relErr: Double = 0.05): org.apache.spark.sql.DataFrame = {
    val toks = graft.GraftSession.widen(docs)
      .select(col(groupCol), col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val exact = toks.groupBy(col(groupCol))
      .agg(countDistinct(col("token")).as("exact_distinct"))
    val whole = toks.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("token"))).as("__est"))
    val halves = toks
      .withColumn("__half", pmod(col(idCol), lit(2)))
      .groupBy(col(groupCol), col("__half"))
      .agg(hll_sketch_agg(col("token")).as("__sk"))
      .groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__estm"))
    exact.join(whole, groupCol).join(halves, groupCol)
      .select(col(groupCol), col("exact_distinct"),
        (abs(col("__est") - col("exact_distinct")) <=
          col("exact_distinct") * relErr).cast("int").as("hll_ok"),
        (col("__estm") === col("__est")).cast("int").as("merge_ok"))
  }

  /** Deflate compression ratio (compressed/raw bytes of UTF-8 text,
    * level 6) — the perplexity-free repetition/boilerplate signal web
    * corpus pipelines use alongside Gopher filters: highly-repetitive
    * or templated text compresses far below natural prose. Narrow
    * per-row UDF (java.util.zip is deterministic for a fixed level and
    * strategy — same bytes on every JVM); empty text → ratio 0. */
  def compressionRatio(text: Column): Column = {
    val f = udf { (t: String) =>
      if (t == null || t.isEmpty) 0.0
      else {
        val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        d.`end`()
        total.toDouble / raw.length
      }
    }
    f(text)
  }

  /** The default cutoffs [[qualityThresholdSweep]] reports — one
    * constant so the facade and the q156 oracle can never drift. */
  val defaultQualityThresholds: Seq[Double] = Seq(0.0, 0.3, 0.4, 0.6, 0.7, 1.0)

  /** Quality-threshold sweep — the "what does each filter setting
    * cost" curve read before committing to a cutoff: for every
    * candidate threshold, how many docs and tokens survive
    * `qualityScore ≥ thr`. Tokenization is materialized ONCE and fed
    * through the `…T` metric variants ([[stopwordRatioT]]'s
    * CodegenFallback-no-CSE lesson — the convenience
    * per-metric calls would re-expand the split ~5×); thresholds
    * explode with constant fan-out, and conditional sums keep
    * zero-survivor thresholds reporting 0 instead of vanishing. The
    * quantity sibling of [[percentileFloor]]'s fixed-rate selection. */
  def qualityThresholdSweep(docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      thresholds: Seq[Double] = defaultQualityThresholds)
      : org.apache.spark.sql.DataFrame = {
    require(thresholds.nonEmpty && thresholds.distinct.size == thresholds.size,
      "thresholds must be non-empty and distinct")
    docs.select(col(textCol).as("__t"), tokens(col(textCol)).as("__toks"))
      .select(
        qualityFromMetrics(size(col("__toks")),
          stopwordRatioT(col("__toks"), defaultStopwords),
          punctRatio(col("__t"))).as("__q"),
        size(col("__toks")).as("__nt"))
      .select(col("__q"), col("__nt"),
        explode(array(thresholds.map(lit): _*)).as("thr"))
      .groupBy(col("thr"))
      .agg(sum(when(col("__q") >= col("thr"), 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("__q") >= col("thr"), col("__nt").cast("long"))
          .otherwise(0L)).as("n_tokens"))
  }

  /** Window-free quantile bucketing — `ntile` without the corpus-wide
    * sort: `n−1` linear-interpolated percentile thresholds come from
    * ONE aggregation (a broadcast 1-row frame), and each row's bucket
    * is `1 + |{t_i < v}|` — a narrow codegen'd comparison against the
    * tiny threshold array. The contract difference from window `ntile`
    * is deliberate: ties share a bucket (value-based boundaries)
    * instead of being split by an arbitrary global order — which is
    * what curriculum bucketing / quality-decile routing actually wants,
    * and what stays deterministic at any parallelism. Use
    * `approx_percentile` thresholds at extreme cardinalities (the
    * [[percentileFloorApprox]] tradeoff). */
  def quantileBuckets(df: org.apache.spark.sql.DataFrame, valueCol: String,
      n: Int = 10): org.apache.spark.sql.DataFrame = {
    require(n >= 2, s"need at least 2 buckets, got $n")
    val ps = (1 until n).map(i => i.toDouble / n)
    val th = df.agg(expr(
      s"percentile($valueCol, array(${ps.mkString(",")}))").as("__th"))
    df.crossJoin(broadcast(th))
      .withColumn("bucket",
        (lit(1) + size(filter(col("__th"),
          t => t < col(valueCol).cast("double")))).cast("int"))
      .drop("__th")
  }

  /** Canonical text normalization — the cleaning pass every corpus
    * gets before dedup/tokenization (mojibake-adjacent variants of the
    * SAME text must hash equal downstream): Unicode NFC composition
    * (decomposed e+◌́ → é), zero-width/BOM removal (U+200B/C/D,
    * U+FEFF — invisible chars that silently split tokens and defeat
    * exact dedup), C0/DEL control chars → space, whitespace-run
    * collapse, trim. Exactly this order, so any engine can replay it
    * (DuckDB: nfc_normalize + three regexp_replace — the q144 oracle).
    * Narrow per-row map (one UDF: java.text.Normalizer is the JDK's
    * Unicode implementation; the regex steps ride along rather than
    * paying three more non-codegen passes), no shuffle. */
  /** HTML → text extraction (the WET-style step before every other
    * curation filter runs on crawled pages): drop script/style/comment
    * blocks wholesale, strip remaining tags to spaces, decode the
    * common named entities, squeeze whitespace. A pure codegen'd
    * `regexp_replace`/`replace` chain — no UDF, no parser — which is
    * both the 100 TB-friendly shape and what lets the DuckDB oracle
    * mirror it operation for operation (RE2-safe: non-greedy
    * quantifiers but no backreferences). `&amp;` decodes LAST so
    * double-encoded entities (`&amp;lt;`) don't double-decode. Not a
    * full HTML5 parser by design: boilerplate-heavy malformed markup
    * degrades to extra whitespace, never to dropped text. */
  def stripHtml(text: Column): Column = {
    // tag patterns require a tag-name start (`</?letter`, `<!word`) so
    // prose like "5 < 6 and 7 > 3" survives — a bare `<[^>]+>` would
    // eat any bracketed span of text
    val noBlocks = Seq(
      "(?is)<script[^>]*>.*?</script>",
      "(?is)<style[^>]*>.*?</style>",
      "(?s)<!--.*?-->",
      "(?s)</?[A-Za-z][^>]*>",
      "(?s)<![A-Za-z][^>]*>").foldLeft(text)((c, p) => regexp_replace(c, p, " "))
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
      "&amp;" -> "&")
      .foldLeft(noBlocks) { case (c, (f, t)) => replace(c, lit(f), lit(t)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Line-level boilerplate removal — the jusText/trafilatura step a
    * WET pipeline runs after [[stripHtml]]: navigation menus, footers
    * and share bars are short, stopword-poor, separator-ridden lines,
    * so each line keeps or drops on three deterministic signals
    * (pipe-separator presence, token count, stopword density). Pure
    * HOF expressions (nested `filter` lambdas), no UDF — scale shape
    * is a narrow per-row map, and the DuckDB oracle mirrors the rules
    * lambda for lambda. Content lines misjudged by the heuristics drop
    * deterministically on BOTH sides (the rules, not a parse, are the
    * contract — same stance as stripHtml's non-parser). */
  def stripBoilerplate(text: Column, minTokens: Int = 5,
      minStopwordRatio: Double = 0.15): Column = {
    val sw = array(defaultStopwords.map(lit): _*)
    val kept = filter(split(text, "\n"), l => {
      val toks = split(trim(lower(l)), "\\s+")
      val n = size(toks)
      val nsw = size(filter(toks, t => array_contains(sw, t)))
      !l.contains(" | ") && n >= minTokens &&
        nsw.cast("double") / n.cast("double") >= minStopwordRatio
    })
    array_join(kept, "\n")
  }

  def normalizeText(text: Column): Column = {
    val f = udf { (t: String) =>
      if (t == null) null
      else
        java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
          .replaceAll("[\\u200B\\u200C\\u200D\\uFEFF]", "")
          .replaceAll("[\\x00-\\x1F\\x7F]", " ")
          .replaceAll("\\s+", " ")
          .trim
    }
    f(text)
  }

  /** Supervised token classifier trained IN-ENGINE — the "distill a
    * cheap curation classifier from labels you already have" op
    * (fastText-style quality/language filters in web-corpus pipelines):
    * multinomial Naive Bayes with add-one smoothing over whitespace
    * tokens, binary label from `labelCol`. Returns per-doc
    * (idCol, s1, s0, pred): the two class log-likelihoods (prior +
    * Σ count·ln p̂, rounded to 6dp) and the argmax decided on the
    * ROUNDED scores, so threshold membership is engine-portable (the
    * q114 lesson).
    *
    * Why NB and not MLlib LogisticRegression: training here is exact
    * integer token counts + closed-form logs — one aggregation pass,
    * no iterative solver — so the MODEL, not just the scores, is
    * reproducible bit-for-bit by a SQL engine, and the whole train+
    * score composition sits under the driver's hash gate. The label
    * column must be NON-NULL on every row — a null label silently
    * drops the row from the class counts and priors; coalesce at the
    * call site (q141 does). (LBFGS's
    * float trajectory can't be mirrored; a model you can't
    * independently recompute is a model you can't audit.)
    *
    * Scale shape: training is one groupBy(token) aggregation with
    * map-side partial counts (compact (token, c1, c0) rows cross the
    * shuffle); the likelihood table is vocabulary-sized — a standing
    * broadcastable asset, like the BPE merge table — and scoring is
    * one join of per-(doc, token) counts against it plus a per-doc
    * agg. Totals and priors travel as broadcast 1-row frames; nothing
    * corpus-sized ever reaches the driver.
    *
    * Multiclass / train-serve-split sibling: [[NbClassifier]] (q217)
    * — same closed-form-over-counts stance, telescoped smoothing,
    * argmax serve over a labeled reference. */
  def nbClassifierScores(
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      label: Column): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol), label.cast("int").as("__y"),
      col(textCol).as("__text"))
    val toks = base.select(col(idCol), col("__y"),
        explode(tokens(col("__text"))).as("tok"))
      .filter(col("tok") =!= "")
    // model: per-token class counts (vocabulary-sized)
    val cnt = toks.groupBy(col("tok")).agg(
      sum(col("__y")).as("c1"),
      sum(lit(1) - col("__y")).as("c0"))
    val tot = cnt.agg(sum(col("c1")).as("t1"), sum(col("c0")).as("t0"),
      count(lit(1)).as("v"))
    val pri = base.agg(sum(col("__y")).as("n1"),
      sum(lit(1) - col("__y")).as("n0"))
    val dt = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c_dt"))
    val parts = dt.join(cnt, "tok")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(
        sum(col("c_dt") * log((col("c1") + 1).cast("double") / (col("t1") + col("v")))).as("p1"),
        sum(col("c_dt") * log((col("c0") + 1).cast("double") / (col("t0") + col("v")))).as("p0"))
    // token-less docs score on the prior alone (left join back, 0 sums)
    base.select(col(idCol))
      .join(parts, Seq(idCol), "left")
      .na.fill(0.0, Seq("p1", "p0"))
      .crossJoin(broadcast(pri))
      .select(col(idCol),
        round(log(col("n1").cast("double") / (col("n1") + col("n0"))) + col("p1"), 6).as("s1"),
        round(log(col("n0").cast("double") / (col("n1") + col("n0"))) + col("p0"), 6).as("s0"))
      .withColumn("pred", (col("s1") > col("s0")).cast("int"))
  }

  /** Corpus diversity by DISTINCT-N (Li et al. 2016's distinct-1/2 —
    * the "how templated is this slice" number synthetic-data pipelines
    * watch before mixing generated text into training data): per
    * slice, distinct n-grams over total n-grams for n = 1, 2. Two
    * narrow explodes and two partial-aggregated counts; the distinct
    * count shuffles compact (slice, ngram) pairs, never documents. A
    * slice whose docs are all single-token has no bigrams and drops in
    * the inner join — a report row with an undefined ratio_2 would be
    * noise, not signal. Ratios rounded 6dp post-division (aggregate-
    * rounding discipline). */
  def distinctNgrams(df: org.apache.spark.sql.DataFrame, sliceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val uni = df.select(col(sliceCol), explode(toks).as("ng"))
    val bi = df.select(col(sliceCol), explode(
        zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("ng"))
    def rep(c: org.apache.spark.sql.DataFrame, n: Int) =
      c.groupBy(col(sliceCol)).agg(
        count(lit(1)).as(s"total_$n"),
        count_distinct(col("ng")).as(s"distinct_$n"))
    rep(uni, 1).join(rep(bi, 2), sliceCol)
      .withColumn("ratio_1",
        round(col("distinct_1").cast("double") / col("total_1"), 6))
      .withColumn("ratio_2",
        round(col("distinct_2").cast("double") / col("total_2"), 6))
  }

  /** COLLOCATION mining — top-k adjacent word pairs by pointwise
    * mutual information (Church & Hanks 1990), the corpus-analysis
    * step that surfaces multi-word units ("new york", "machine
    * learning") worth protecting from tokenizers and dedup shinglers.
    * PMI over the bigram event space with bigram-margin unigram
    * probabilities:
    *
    *   pmi(x, y) = ln( c(x,y) · T / (c₁(x) · c₂(y)) )
    *
    * where T = total bigram instances, c₁(x) = x's count as a FIRST
    * element, c₂(y) = y's as a SECOND — margins of the same event
    * space, so Σp = 1 on every axis (mixing unigram token counts in
    * would not marginalize). `minCount` floors the classic PMI
    * rare-pair explosion (a hapax pair maxes the score by luck);
    * rank by (rounded pmi DESC, pair) — the total order both engines
    * share.
    *
    * Scale shape: two Zipf-bounded count aggregations off one narrow
    * explode, a margin join, and a global top-k that plans as
    * TakeOrdered (no full sort of the vocabulary); the bounded rank
    * window runs over k rows. */
  def collocations(df: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 50): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val bi = df.select(explode(
        zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val m1 = bc.groupBy(col("w1")).agg(sum(col("cb")).as("c1"))
    val m2 = bc.groupBy(col("w2")).agg(sum(col("cb")).as("c2"))
    val total = bc.agg(sum(col("cb")).as("t"))
    val scored = bc.filter(col("cb") >= minCount)
      .join(m1, "w1").join(m2, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("cb"),
        // double arithmetic BEFORE the products: c·T and c₁·c₂ at
        // web scale (T ~ 1e13) overflow BIGINT multiplication
        round(log(col("cb").cast("double") * col("t") /
          (col("c1").cast("double") * col("c2"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
    // rank over the k surviving rows only (bounded window)
    scored.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("pmi").desc, col("w1"), col("w2"))))
  }
}
