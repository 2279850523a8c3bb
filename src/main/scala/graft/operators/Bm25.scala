package graft.operators

import org.apache.spark.sql.DataFrame
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
      .withColumn("w",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("w")).as("bm25"))
  }
}
