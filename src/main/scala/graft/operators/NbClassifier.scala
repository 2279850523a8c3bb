package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the model-based
  * classifier stage of a curation pipeline (domain routing, the
  * "train a classifier on a trusted reference, score the crawl"
  * selection step of GPT-3/LLaMA-style pipelines, contamination
  * triage). Deliberately NB rather than an iterative learner: training
  * is two count aggregations, scoring is one join — every number is a
  * closed-form function of exact integer counts, so the whole model
  * (fit AND serve) hash-matches a SQL oracle, the repo's strongest
  * gate, where an LBFGS fit could only offer statistical floors.
  *
  * Relationship to [[TextAnalysis.nbClassifierScores]] (q141): that is
  * the BINARY in-corpus scorer — one boolean signal, scored over the
  * same frame it was counted on, serving a log-odds column for
  * threshold filters. This object is the MULTICLASS fit/serve split:
  * train on a labeled reference, classify a different frame, argmax
  * serve — the "classifier as a standing model" surface. The two keep
  * their own arithmetic (q141's per-token form vs the telescoped form
  * here) because each is hash-gated against its own oracle; the
  * telescoped form is the one that avoids materializing any smoothed
  * zero.
  *
  * Add-one (Laplace) smoothing with the vocabulary of the TRAINING
  * corpus. The per-document class score telescopes:
  *
  *   score(d, c) = ln(N_c/N) − n_d·ln(T_c + V) + Σᵢ ln(cnt(c, tᵢ) + 1)
  *
  * where the sum runs over the doc's token instances and a (class,
  * token) pair unseen in training contributes ln(0 + 1) = 0 — so the
  * scorer needs ONLY the observed (class, token) count table (Zipf-
  * bounded), never the dense vocab × classes smoothing grid: absent
  * join rows ARE the smoothed zeros. Out-of-vocabulary tokens fall out
  * the same way (count 0 in every class — they shift all classes
  * equally via the n_d·ln(T_c+V) term and decide nothing).
  *
  * Scale shape: fit = one narrow explode + two count aggregations
  * (map-side combine; model size = observed pairs, ≪ corpus tokens).
  * Serve = one equi-join of token instances against the pair table,
  * one per-(doc, class) aggregation, one broadcast of the tiny class
  * table. No window over the corpus, nothing driver-sized but the
  * class list.
  */
object NbClassifier {

  /** Per-(doc, class) log scores: (id, label, score), score rounded to
    * the repo-wide 4dp grid (the Σ ln(cnt+1) sum is a float reduction,
    * combine-order-dependent like every DOUBLE aggregate here).
    * `train` must carry `labelCol`; docs scored need not. */
  def scoreAgainst(docs: DataFrame, train: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "label"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val trainInst = train.select(col(labelCol).as("label"),
      explode(toks).as("token"))
    // observed (class, token) counts — the entire model beyond 3 scalars/class
    val cc = trainInst.groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    // per-class doc count and token mass; corpus-wide doc count and vocab
    val byClass = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_c"),
        sum(size(toks).cast("long")).as("t_c"))
    val globals = trainInst.agg(
      countDistinct(col("token")).as("v"))
      .crossJoin(train.agg(count(lit(1)).as("n")))
    val classes = byClass.crossJoin(globals)
      .select(col("label"),
        log(col("n_c").cast("double") / col("n")).as("logprior"),
        log((col("t_c") + col("v")).cast("double")).as("logden"))
    val inst = docs.select(col(idCol), explode(toks).as("token"))
    val hits = inst.join(cc, Seq("token"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(log(col("cnt") + lit(1))).as("hitsum"))
    docs.select(col(idCol), size(toks).cast("long").as("__n_d"))
      .crossJoin(broadcast(classes))
      .join(hits, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        round(col("logprior") - col("__n_d") * col("logden") +
          coalesce(col("hitsum"), lit(0.0)), 4).as("score"))
  }

  /** Argmax serve: (id, label) with the highest score, ties broken by
    * label ascending (total order — the 4dp grid makes cross-engine
    * ties representable, so the break must be deterministic). */
  def classify(docs: DataFrame, train: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "label"): DataFrame =
    graft.plans.TopKPerKey.rankedTopKMulti(
      scoreAgainst(docs, train, idCol, textCol, labelCol)
        .withColumn("__ns", -col("score")),
      keyCols = Seq(idCol), orderAsc = Seq("__ns", "label"), k = 1)
      .select(col(idCol), col("label").as("pred"), col("score"))
}
