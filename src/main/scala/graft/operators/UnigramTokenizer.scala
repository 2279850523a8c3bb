package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subword tokenizers beyond BPE: a unigram language-model tokenizer
  * (Kudo 2018, the SentencePiece `--model_type=unigram` algorithm)
  * trained by EM over the corpus's word-type histogram, and the greedy
  * longest-match ("MaxMatch") segmenter of WordPiece (Devlin et al.
  * 2019) serving the same piece vocabulary. Together with [[Bpe]] this
  * covers the three subword families a pretraining pipeline actually
  * chooses between.
  *
  * Production shape (same split as [[Bpe.fit]]): the CORPUS-sized work
  * is one distributed word-type histogram — explode + groupBy with
  * map-side combine, heap-pruned to `maxWordTypes` (Heaps' law keeps
  * word types sublinear in corpus size, and the cap makes the driver
  * footprint explicit). The EM loop then runs driver-side over the
  * bounded (word type, count) table: per iteration one forward-backward
  * lattice pass per WORD TYPE (not per occurrence — counts weight the
  * expected-count accumulation), so training cost is O(types · len ·
  * maxPieceLen) per iteration regardless of corpus size. Encoding
  * broadcasts the piece table inside a narrow UDF: no shuffle.
  *
  * Determinism: seed selection, pruning, and Viterbi all tie-break
  * lexicographically; EM runs a fixed iteration count in a fixed
  * driver-side order, so a fixed histogram yields a fixed piece table
  * (UnigramTokenizerSpec pins a hand-checked example).
  *
  * Fixed-point costs: the SERVED asset stores integer costs
  * `cost = round(−1e6 · ln p)` rather than float probabilities, so
  * Viterbi and any engine replaying it (the DuckDB gate oracles)
  * compare exact BIGINTs — no float-order divergence can flip a
  * segmentation between engines.
  */
object UnigramTokenizer {

  /** Cost charged for an out-of-alphabet character (consumed as one
    * `<unk>` token): worse than any real piece — EM floors
    * probabilities at 1e-9, so the costliest possible piece is
    * −1e6·ln(1e-9) ≈ 20,723,266 < 25,000,000 (≙ ln p = −25) — so
    * Viterbi never prefers an unk over a covering piece. */
  val UnkCost: Long = 25000000L

  val Unk = "<unk>"

  /** One EM round's trajectory: total corpus log-likelihood after each
    * iteration (the classic EM invariant — non-decreasing within a
    * fixed vocabulary — which the driver gate turns into an ok-bit). */
  final case class FitResult(
      pieces: Seq[(String, Double)],
      likelihoodTrajectories: Seq[Seq[Double]])

  /** Train on the corpus's whitespace-lowercased word types. Returns
    * (piece, probability) plus the per-round likelihood trajectories.
    * Distributed work = the one histogram; see the object scaladoc. */
  def fit(docs: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 2000, emIters: Int = 2, maxPieceLen: Int = 6,
      maxWordTypes: Int = 1000000): FitResult = {
    val wordCounts = graft.GraftSession.widen(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitLocal(wordCounts.toSeq, vocabSize, seedSize, emIters, maxPieceLen)
  }

  /** The driver-side EM + prune loop over a (word, count) histogram.
    *
    * Seed: all substrings of length 2..maxPieceLen scored by
    * Σ count·len over containing word types, top `seedSize` with a
    * lexicographic tie-break, plus every single character (single
    * characters are never pruned — they guarantee any in-alphabet word
    * segments). Then rounds of (emIters EM iterations → prune the
    * worst non-char pieces by expected count, 20% per round) until the
    * vocabulary fits `vocabSize`, and one final EM round on the final
    * vocabulary. Probabilities are floored at 1e-9 before normalizing
    * so no surviving piece is ever unreachable in the next E-step. */
  def fitLocal(wordCounts: Seq[(String, Long)], vocabSize: Int,
      seedSize: Int = 2000, emIters: Int = 2,
      maxPieceLen: Int = 6): FitResult = {
    val words = wordCounts.toArray
    val chars: Set[String] =
      words.iterator.flatMap(_._1.map(_.toString)).toSet
    // single characters are never pruned (they guarantee coverage), so
    // a budget below the alphabet could never be met — fail loudly
    // instead of looping the prune rounds forever
    require(vocabSize >= chars.size,
      s"vocabSize=$vocabSize is below the corpus alphabet " +
        s"(${chars.size} single characters, which are never pruned)")

    // substring seed scores: Σ count · len
    val seedScore = new java.util.HashMap[String, Long]()
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 2
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          seedScore.merge(s, c * s.length, _ + _)
          j += 1
        }
        i += 1
      }
    }
    val seeds = {
      import scala.jdk.CollectionConverters._
      seedScore.asScala.toSeq
        .sortBy { case (s, sc) => (-sc, s) }
        .take(math.max(0, seedSize - chars.size))
        .map(_._1)
    }

    var probs: Map[String, Double] = {
      val all = (chars ++ seeds).toSeq.sorted
      // init ∝ seed score (chars score Σ count over containing words)
      val raw = all.map { s =>
        s -> math.max(1L,
          if (s.length >= 2) seedScore.getOrDefault(s, 1L)
          else words.iterator.filter(_._1.contains(s)).map(_._2).sum).toDouble
      }
      val tot = raw.iterator.map(_._2).sum
      raw.map { case (s, v) => s -> v / tot }.toMap
    }

    val trajectories = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    var done = false
    while (!done) {
      val (p2, traj) = emRounds(words, probs, emIters, maxPieceLen)
      probs = p2
      trajectories += traj
      val nonChars = probs.keysIterator.filter(_.length >= 2).size
      if (chars.size + nonChars <= vocabSize) done = true
      else {
        // prune 20% of non-char pieces by expected-count-proxy = prob,
        // never below the target; lexicographic tie-break
        val keepN = math.max(vocabSize - chars.size, (nonChars * 4) / 5)
        val kept = probs.toSeq.filter(_._1.length >= 2)
          .sortBy { case (s, p) => (-p, s) }.take(keepN).map(_._1).toSet
        val all = probs.filter { case (s, _) => s.length < 2 || kept(s) }
        val tot = all.valuesIterator.sum
        probs = all.map { case (s, p) => s -> p / tot }
      }
    }
    FitResult(probs.toSeq.sortBy(_._1), trajectories.toSeq)
  }

  /** `emIters` EM iterations over a fixed vocabulary. Returns the new
    * probabilities and the corpus log-likelihood after each iteration
    * (computed with the PRE-update parameters of that iteration — the
    * sequence is non-decreasing by the EM guarantee). */
  private def emRounds(words: Array[(String, Long)],
      init: Map[String, Double], emIters: Int,
      maxPieceLen: Int): (Map[String, Double], Seq[Double]) = {
    var probs = init
    val traj = scala.collection.mutable.ArrayBuffer.empty[Double]
    var it = 0
    while (it < emIters) {
      val expected = new java.util.HashMap[String, Double]()
      var ll = 0.0
      words.foreach { case (w, c) =>
        ll += c * accumulateExpected(w, c, probs, maxPieceLen, expected)
      }
      traj += ll
      val tot = {
        var s = 0.0
        expected.forEach((_, v) => s += v)
        s
      }
      // floor + renormalize so every surviving piece stays reachable
      val floored = probs.map { case (k, _) =>
        k -> math.max(expected.getOrDefault(k, 0.0) / tot, 1e-9)
      }
      val ftot = floored.valuesIterator.sum
      probs = floored.map { case (k, v) => k -> v / ftot }
      it += 1
    }
    (probs, traj.toSeq)
  }

  /** Forward-backward over one word's segmentation lattice: adds
    * `c · E[occurrences of piece]` into `acc` for each piece and
    * returns ln P(word) under the current model. Plain doubles — words
    * are short and probabilities floored, so α ≥ 1e-9^len stays far
    * above double underflow. */
  private def accumulateExpected(w: String, c: Long,
      probs: Map[String, Double], maxPieceLen: Int,
      acc: java.util.HashMap[String, Double]): Double = {
    val n = w.length
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0; beta(n) = 1.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      var a = 0.0
      while (j < i) {
        val p = probs.getOrElse(w.substring(j, i), 0.0)
        if (p > 0) a += alpha(j) * p
        j += 1
      }
      alpha(i) = a
      i += 1
    }
    i = n - 1
    while (i >= 0) {
      var j = i + 1
      var b = 0.0
      val jmax = math.min(n, i + maxPieceLen)
      while (j <= jmax) {
        val p = probs.getOrElse(w.substring(i, j), 0.0)
        if (p > 0) b += p * beta(j)
        j += 1
      }
      beta(i) = b
      i -= 1
    }
    val z = alpha(n)
    if (z <= 0) return 0.0 // unsegmentable word contributes nothing
    i = 0
    while (i < n) {
      var j = i + 1
      val jmax = math.min(n, i + maxPieceLen)
      while (j <= jmax) {
        val piece = w.substring(i, j)
        val p = probs.getOrElse(piece, 0.0)
        if (p > 0) {
          val e = alpha(i) * p * beta(j) / z
          if (e > 0) acc.merge(piece, c * e, _ + _)
        }
        j += 1
      }
      i += 1
    }
    math.log(z)
  }

  /** Integer Viterbi costs from probabilities: `round(−1e6 · ln p)` —
    * the fixed-point form the served asset stores (object scaladoc). */
  def toCosts(pieces: Seq[(String, Double)]): Seq[(String, Long)] =
    pieces.map { case (s, p) => s -> math.round(-1e6 * math.log(p)) }

  /** Viterbi segmentation of one word under integer piece costs.
    * dp(i) = best (cost, nPieces) over pieces ending at i, the start
    * position scanned ascending with strictly-less replacement — so
    * ties prefer fewer pieces, then the LONGEST final piece. Characters
    * no piece covers are consumed singly as [[Unk]] at [[UnkCost]].
    * Returns the piece list ([[Unk]] for unknown chars). */
  def viterbi(w: String, costs: Map[String, Long],
      maxPieceLen: Int = 6): Array[String] = {
    val n = w.length
    val bestCost = Array.fill(n + 1)(Long.MaxValue)
    val bestN = Array.fill(n + 1)(Int.MaxValue)
    val back = new Array[Int](n + 1) // start index of the final piece
    bestCost(0) = 0L; bestN(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (bestCost(j) != Long.MaxValue) {
          val c = costs.get(w.substring(j, i)) match {
            case Some(pc) => Some(pc)
            case None if i - j == 1 => Some(UnkCost)
            case None => None
          }
          c.foreach { pc =>
            val cand = bestCost(j) + pc
            val candN = bestN(j) + 1
            if (cand < bestCost(i) ||
                (cand == bestCost(i) && candN < bestN(i))) {
              bestCost(i) = cand; bestN(i) = candN; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      val j = back(k)
      val piece = w.substring(j, k)
      out += (if (costs.contains(piece)) piece else Unk)
      k = j
    }
    out.reverseIterator.toArray
  }

  /** Total Viterbi cost of a word (Σ piece costs, unks at [[UnkCost]])
    * — the DP optimum, for the gate's optimality comparisons. */
  def viterbiCost(w: String, costs: Map[String, Long],
      maxPieceLen: Int = 6): Long =
    segmentationCost(viterbi(w, costs, maxPieceLen), costs)

  /** Greedy longest-match (WordPiece MaxMatch): at each position take
    * the longest piece prefixing the remainder; an uncovered leading
    * character is consumed singly as [[Unk]]. Linear, single-path —
    * which is exactly why the DuckDB oracle can replay it as a
    * one-successor recursive CTE where Viterbi's exponential lattice
    * cannot. */
  def maxMatch(w: String, costs: Map[String, Long],
      maxPieceLen: Int = 6): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      var len = math.min(maxPieceLen, w.length - i)
      var hit = 0
      while (len >= 1 && hit == 0) {
        if (costs.contains(w.substring(i, i + len))) hit = len
        else len -= 1
      }
      if (hit == 0) { out += Unk; i += 1 }
      else { out += w.substring(i, i + hit); i += hit }
    }
    out.toArray
  }

  /** Cost of an explicit segmentation (unk entries — or pieces missing
    * from the table — charge [[UnkCost]]). */
  def segmentationCost(pieces: Array[String],
      costs: Map[String, Long]): Long =
    pieces.iterator.map(p => costs.getOrElse(p, UnkCost)).sum

  // ---- Column faces (narrow UDFs over broadcast piece tables) ----

  /** The faces' word normalization: locale-pinned lowercase (a Turkish
    * default locale would dot-swap I/i and miss committed pieces) +
    * whitespace split, mirroring `TextAnalysis.tokens`. Exotic
    * whitespace/astral chars follow the fixture contract documented on
    * [[graft.PieceAssets]]. */
  private def normWords(text: String): Array[String] =
    text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)

  private def perWord(textCol: Column)(f: String => Array[Long]): Column = {
    val g = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else normWords(text).flatMap(f)
    }
    g(textCol)
  }

  /** Token ids of a text under Viterbi segmentation: pieces map through
    * `ids`, unks to 0. */
  def viterbiIds(textCol: Column, costs: Map[String, Long],
      ids: Map[String, Long], maxPieceLen: Int = 6): Column =
    perWord(textCol)(w =>
      viterbi(w, costs, maxPieceLen).map(p => ids.getOrElse(p, 0L)))

  /** Token ids under MaxMatch segmentation. */
  def maxMatchIds(textCol: Column, costs: Map[String, Long],
      ids: Map[String, Long], maxPieceLen: Int = 6): Column =
    perWord(textCol)(w =>
      maxMatch(w, costs, maxPieceLen).map(p => ids.getOrElse(p, 0L)))

  /** (viterbi_cost, maxmatch_cost, char_cost, lossless) per text — the
    * gate's raw material in one pass: Viterbi's total cost, MaxMatch's
    * total cost, the all-single-characters cost, and whether Viterbi's
    * pieces concatenate back to every word (unks break losslessness by
    * construction). */
  def gateMetrics(textCol: Column, costs: Map[String, Long],
      maxPieceLen: Int = 6): Column = {
    val f = udf { (text: String) =>
      if (text == null) (0L, 0L, 0L, true)
      else {
        val ws = normWords(text)
        var v = 0L; var m = 0L; var c = 0L; var lossless = true
        ws.foreach { w =>
          val vp = viterbi(w, costs, maxPieceLen)
          v += segmentationCost(vp, costs)
          m += segmentationCost(maxMatch(w, costs, maxPieceLen), costs)
          c += w.map(ch => costs.getOrElse(ch.toString, UnkCost)).sum
          if (vp.mkString("") != w) lossless = false
        }
        (v, m, c, lossless)
      }
    }
    f(textCol)
  }

  /** Persist a piece table (piece, cost, token_id) as a tiny ordered
    * parquet — the durable tokenizer asset, like [[Bpe.save]]. */
  def save(spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[(String, Long)], path: String): Unit = {
    import spark.implicits._
    pieces.sortBy(_._1).zipWithIndex
      .map { case ((s, c), i) => (s, c, i + 1L) } // id 0 = <unk>
      .toDF("piece", "cost", "token_id")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a piece table saved by [[save]]: (piece → cost, piece → id). */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): (Map[String, Long], Map[String, Long]) = {
    val rows = spark.read.parquet(path)
      .orderBy(col("token_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    (rows.map(r => r._1 -> r._2).toMap, rows.map(r => r._1 -> r._3).toMap)
  }
}
