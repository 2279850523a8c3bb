package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the batch-prep step of a pretraining
  * pipeline: concatenate documents (in a stable order) into training
  * sequences of at most `budget` tokens, starting a new sequence when
  * the next document would overflow. A document larger than the budget
  * still gets a bin of its own (truncation is a later, separate
  * decision).
  *
  * Distribution contract: the GROUP is the parallel unit (pack per
  * source/shard/topic), exactly like sessionization — packing is
  * inherently sequential within a group (bin k's boundary depends on
  * every earlier document), so the only honest distributed shape is
  * "many groups, each folded locally". One shuffle on the group key;
  * each group's (id, tokens) pairs — two longs per doc, not the text —
  * must fit in one task, which holds whenever groups are shards of a
  * corpus rather than the corpus itself (re-shard upstream if not).
  */
object Packing {

  // public: Spark's generated (de)serializers access these from
  // synthesized classes, which cannot see private members
  case class PackIn(grp: String, id: Long, tokens: Long)
  case class PackOut(grp: String, id: Long, tokens: Long, bin: Int)

  /** Pack each group's docs (ascending `idCol`) into consecutive bins
    * of ≤ `budget` tokens. Returns (grp, id, tokens, bin); bins number
    * from 0 within each group. Greedy first-overflow-breaks: a break
    * happens only when the bin is non-empty (`acc > 0`), so an
    * oversized document occupies exactly one bin rather than an empty
    * bin followed by its own. */
  def packGreedy(docs: DataFrame, idCol: String, tokenCol: String,
      groupCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tokens"))
      .as[PackIn]
      .groupByKey(_.grp)
      .flatMapGroups { (g, it) =>
        val arr = it.toArray.sortBy(_.id)
        var bin = 0
        var acc = 0L
        arr.iterator.map { d =>
          if (acc > 0 && acc + d.tokens > budget) { bin += 1; acc = 0L }
          acc += d.tokens
          PackOut(g, d.id, d.tokens, bin)
        }
      }
      .toDF("grp", "id", "tokens", "bin")
  }

  /** Padding-waste curve for LENGTH-BUCKETED batching — the number
    * that picks an inference/training batching policy before any
    * batches are materialized: bucketing docs by token length into
    * ranges of width `w` and padding each bucket to its max length
    * wastes `1 − Σlen / Σ_bucket (max·count)` of the compute; the
    * curve over several widths shows where the padding knee sits
    * (w = 0 means one global bucket — pad-everything-to-max, the
    * worst case; w = 1 is exact-length batching, zero waste).
    *
    * Shape: ONE narrow pass — token counts are a codegen'd projection,
    * widths explode per row (|widths|×, a constant), then two
    * partial-aggregated groupBys ((width, bucket) → width). No window,
    * no batch materialization, no collect. */
  def paddingWasteCurve(docs: DataFrame, textCol: String,
      widths: Seq[Int] = Seq(1, 8, 16, 32, 0)): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ >= 0), "widths must be >= 0")
    // a duplicated width would double-count its (docs, tokens) lane
    // through the shared groupBy — reject, don't silently merge
    require(widths.distinct.size == widths.size,
      s"duplicate widths: ${widths.mkString(",")}")
    import graft.operators.TextAnalysis
    val lens = docs.select(TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .select(col("n_tok"),
        explode(array(widths.map(lit): _*)).as("bucket_width"))
      .withColumn("bucket",
        when(col("bucket_width") === 0, lit(0L))
          .otherwise(expr("n_tok div bucket_width")))
    lens.groupBy(col("bucket_width"), col("bucket"))
      .agg(max(col("n_tok")).as("mx"), sum(col("n_tok")).as("s"),
        count(lit(1)).as("c"))
      .groupBy(col("bucket_width"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("s")).cast("long").as("real_tokens"),
        sum(col("mx") * col("c")).cast("long").as("padded_tokens"))
      .withColumn("waste",
        round(lit(1.0) - col("real_tokens").cast("double")
          / col("padded_tokens"), 6))
  }
}
