package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew.
  *
  * AQE's skew-join splitting handles moderate skew by splitting
  * oversized partitions, but a single hot key still lands every probe
  * row for that key in tasks that all read the same build rows. Salting
  * breaks the hot key itself: the probe side gets a uniform random salt
  * in [0, S), the build side is replicated S ways, and the join key
  * becomes (key, salt) — each hot key now spreads over S tasks at the
  * cost of an S× replication of the (small) build side.
  *
  * Result-equivalent to `large.join(small, key)` for inner joins.
  */
object SkewJoin {

  def saltedInnerJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16, seed: Long = 42L): DataFrame = {
    require(saltBuckets > 0)
    val salted = large.withColumn(
      "__salt", (rand(seed) * saltBuckets).cast("int"))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnostics — the pre-flight for every corpus-scale
    * equi-join/groupBy: per-key row counts summarized as a long-format
    * (metric, value) report. `skew_ratio` (max/mean) is the number
    * that decides between a plain shuffle join, AQE skew splitting,
    * and [[saltedInnerJoin]]; the count quantiles say whether the
    * tail is one hot key (salt it) or a heavy family (repartition).
    *
    * Shape: ONE partial-aggregated groupBy over the keys (compact
    * (key, n) rows cross the shuffle), then one aggregation over the
    * key-cardinality-sized count table — exact linear-interpolated
    * `percentile` buffers over |keys| values; swap in approx_percentile
    * at billion-key cardinalities (the percentileFloorApprox
    * tradeoff). Doubles rounded to 6dp (aggregate-rounding
    * discipline); counts are exact integers widened to double for the
    * uniform value column. */
  def describeSkew(df: DataFrame, keyCols: Seq[String],
      percentiles: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must name at least one column")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val pAggs = percentiles.map(p =>
      round(expr(s"percentile(n, ${p})"), 6)
        .as(s"p${(p * 100).round}_key_rows"))
    val aggs = Seq(
      count(lit(1)).cast("double").as("n_keys"),
      sum(col("n")).cast("double").as("n_rows"),
      max(col("n")).cast("double").as("max_key_rows"),
      round(avg(col("n")), 6).as("mean_key_rows")) ++ pAggs
    val one = counts.agg(aggs.head, aggs.tail: _*)
      .withColumn("skew_ratio",
        round(col("max_key_rows") / col("mean_key_rows"), 6))
    val metrics = one.columns
    one.select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).as("value"))): _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }
}
