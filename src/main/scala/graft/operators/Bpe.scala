package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
  * 2016) — real merge-table training, not the regex token-count proxy.
  *
  * Production shape (the same split HF tokenizers / sentencepiece use):
  * the CORPUS-sized work is one distributed word-type histogram
  * (explode + groupBy + heap-pruned cap); the merge loop then runs
  * driver-side over the bounded (word-type, count) table — word types
  * grow sublinearly (Heaps' law), and `maxWordTypes` makes the driver
  * footprint explicit. Encoding broadcasts the merge list inside a UDF:
  * narrow, no shuffle.
  *
  * Determinism: pair-count ties break to the lexicographically smallest
  * pair, so a fixed corpus yields a fixed merge table (specced on the
  * classic low/lower/newest/widest example).
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Train `numMerges` merges on the corpus's whitespace-lowercased
    * word types. Returns merges in application order. */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      maxWordTypes: Int = 1000000): Seq[(String, String)] = {
    val wordCounts = graft.GraftSession.widen(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitLocal(wordCounts.toSeq, numMerges)
  }

  /** The driver-side merge loop over a (word, count) histogram. */
  def fitLocal(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // symbol sequences per word type, weighted
    var words: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, c)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.merge(k, c, _ + _)
          j += 1
        }
      }
      if (counts.isEmpty) i = numMerges
      else {
        // argmax count, ties -> lexicographically smallest pair
        var best: (String, String) = null
        var bestC = -1L
        counts.forEach { (k, c) =>
          if (c > bestC || (c == bestC &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestC = c
          }
        }
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        i += 1
      }
    }
    merges.toSeq
  }

  private def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += (syms(j) + syms(j + 1)); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Segment one word (no EndOfWord appended yet) through the merge
    * table in training order. */
  def encodeWord(w: String, merges: IndexedSeq[(String, String)]): Array[String] = {
    var syms = (w.map(_.toString) :+ EndOfWord).toArray
    var i = 0
    while (i < merges.length) { syms = mergeOnce(syms, merges(i)); i += 1 }
    syms
  }

  /** Column: BPE segment count of a text under the (broadcast) merge
    * table — the honest token-count a byte-pair tokenizer would bill,
    * vs the whitespace proxy. Narrow, codegen-adjacent (one UDF). */
  def segmentCount(textCol: Column, merges: Seq[(String, String)]): Column = {
    val m: IndexedSeq[(String, String)] = merges.toIndexedSeq
    val f = udf { (text: String) =>
      if (text == null) 0L
      else {
        val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        var n = 0L
        toks.foreach { w => n += encodeWord(w, m).length }
        n
      }
    }
    f(textCol)
  }

  /** Persist a merge table as a tiny ordered parquet — the tokenizer
    * is a durable pipeline asset (train once, bill every corpus). */
  def save(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("merge_rank", "left", "right")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merge table saved by [[save]], in training order. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

  val Unk = "<unk>"

  /** Deterministic token-id vocabulary from a merge table + base
    * character set: id 0 is reserved for [[Unk]], then the base symbols
    * (single characters + [[EndOfWord]]) sorted lexicographically, then
    * one id per merge PRODUCT in training order (a product string that
    * collided with an earlier symbol keeps the earlier id — two merges
    * like (a,bc) and (ab,c) can both spell "abc"). Contiguous ids, so
    * the vocab doubles as an embedding-row index for training. */
  def vocab(merges: Seq[(String, String)], baseChars: Seq[String]): Seq[(String, Long)] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Long](Unk -> 0L)
    (baseChars.distinct.sorted :+ EndOfWord).distinct.sorted.foreach { s =>
      if (!out.contains(s)) out(s) = out.size.toLong
    }
    merges.foreach { case (a, b) =>
      val p = a + b
      if (!out.contains(p)) out(p) = out.size.toLong
    }
    out.toSeq
  }

  /** Base character set of a corpus — the distinct characters of the
    * word-type histogram under the SAME heap-pruned `maxWordTypes` cap
    * as [[fit]], so a vocab built from (fit, baseChars) with matching
    * caps covers exactly the alphabet the trainer saw (characters that
    * only occur in beyond-cap word types encode as unk, consistently
    * on both paths). */
  def baseChars(docs: DataFrame, textCol: String, maxWordTypes: Int = 1000000): Seq[String] =
    graft.GraftSession.widen(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxWordTypes)
      .select(explode(split(col("w"), "")).as("c"))
      .filter(length(col("c")) > 0)
      .distinct().orderBy(col("c"))
      .collect().map(_.getString(0)).toSeq

  /** Column: token IDS of a text under a (broadcast) merge table +
    * vocab — the trainable output of the tokenizer (what a pretraining
    * pipeline materializes), not just billing counts. Symbols outside
    * the vocab map to [[Unk]]'s id 0. One narrow UDF, no shuffle. */
  def encodeIds(textCol: Column, merges: Seq[(String, String)],
      vocabMap: Map[String, Long]): Column = {
    val m: IndexedSeq[(String, String)] = merges.toIndexedSeq
    val f = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, m).map(s => vocabMap.getOrElse(s, 0L)))
    }
    f(textCol)
  }

  /** Inverse of [[encodeIds]] for in-vocab text: ids → symbols,
    * [[EndOfWord]] → word break. Round-trips (BpeSpec) because merges
    * only ever concatenate characters of the original word. */
  def decodeIds(ids: Seq[Long], vocabSeq: Seq[(String, Long)]): String = {
    val inv = vocabSeq.map(_.swap).toMap
    ids.map(id => inv.getOrElse(id, Unk)).mkString("")
      .split(java.util.regex.Pattern.quote(EndOfWord)).mkString(" ").trim
  }

  /** Persist a vocab as ordered parquet (token, token_id) — the second
    * durable tokenizer asset next to the merge table ([[save]]). */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
      vocabSeq: Seq[(String, Long)], path: String): Unit = {
    import spark.implicits._
    vocabSeq.toDF("token", "token_id").repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a vocab saved by [[saveVocab]], in id order. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Long)] =
    spark.read.parquet(path).orderBy(col("token_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Column: the segments themselves (space-joined per word, '|'
    * between words) — for inspection/tests. */
  def segments(textCol: Column, merges: Seq[(String, String)]): Column = {
    val m: IndexedSeq[(String, String)] = merges.toIndexedSeq
    val f = udf { (text: String) =>
      if (text == null) ""
      else text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        .map(w => encodeWord(w, m).mkString(" ")).mkString("|")
    }
    f(textCol)
  }
}
