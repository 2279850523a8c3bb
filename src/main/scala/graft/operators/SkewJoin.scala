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

  /** Equi-join OUTPUT-SIZE estimation by count-min inner product
    * (Cormode & Muthukrishnan 2005, §4.2) — the other pre-flight
    * number next to [[describeSkew]]: |A ⋈ B| = Σ_k a_k·b_k, estimated
    * from two tiny sketch tables without touching the join. The
    * sketch is built AS A DATAFRAME — (d, bucket, cnt) rows from one
    * partial-aggregated pass per side — so it is mergeable across
    * partitions/days by construction (sum of counts), and the inner
    * product is a (d, bucket)-keyed equi-join of two depth×width-row
    * tables: nothing corpus-sized moves.
    *
    * Estimator properties (pinned by [[joinSizeChecked]]'s bits): each
    * depth row over-counts (hash collisions only ADD cross products),
    * so min_d Σ_bucket a·b NEVER under-estimates; and it exceeds the
    * true size by more than e·N_a·N_b/width with probability
    * ≤ e^-depth. Null keys are dropped before sketching (they never
    * match in an equi-join).
    *
    * Returns ONE row: (n_a, n_b, est_join_rows) — and never executes
    * the join being estimated. */
  def joinSizeEstimate(a: DataFrame, b: DataFrame,
      keyA: String, keyB: String,
      depth: Int = 5, width: Int = 8192, seed: Long = 42L): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1, width >= 2")
    // xxhash64 hashes by the column's NATIVE type, so an int-vs-bigint
    // key pair (a legal equi-join after Spark's implicit coercion)
    // would hash equal values into different buckets — matching keys
    // stop colliding and the never-under guarantee silently breaks.
    // Align types before sketching: integral pairs widen to long (the
    // same comparison type Spark's join coercion picks); anything else
    // mismatched fails loud rather than under-estimating quietly.
    val (ta, tb) = (a.schema(keyA).dataType, b.schema(keyB).dataType)
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val widen = ta != tb && integral(ta) && integral(tb)
    require(ta == tb || widen,
      s"joinSizeEstimate: key types differ ($keyA: $ta vs $keyB: $tb) and are " +
        "not both integral — cast them to a common type before sketching")
    // null keys never match in an equi-join — drop them BEFORE
    // sketching (xxhash64 would otherwise pile every null-key row into
    // one bucket per depth and inflate the inner product past the
    // bound on perfectly legal input)
    def sketch(df: DataFrame, key: String): DataFrame =
      df.select((if (widen) col(key).cast("long") else col(key)).as("__k"))
        .where(col("__k").isNotNull)
        .select(col("__k"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
        .select(col("d"),
          pmod(xxhash64(col("__k"), col("d"), lit(seed)), lit(width)).as("bucket"))
        .groupBy(col("d"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val sa = sketch(a, keyA)
    val sb = sketch(b, keyB)
    // coalesce: an empty side makes the sketch join empty and min(ip)
    // NULL — the true size is 0, report 0, not a null bit upstream
    sa.join(sb.withColumnRenamed("cnt", "cnt_b"), Seq("d", "bucket"))
      .groupBy(col("d")).agg(sum(col("cnt") * col("cnt_b")).as("ip"))
      .agg(coalesce(min(col("ip")), lit(0L)).as("est_join_rows"))
      .crossJoin(a.agg(count(lit(1)).as("n_a")))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .select(col("n_a"), col("n_b"), col("est_join_rows"))
  }

  /** [[joinSizeEstimate]] PLUS the exact join as ground truth and the
    * estimator-guarantee bits — the fixture/regression form. This one
    * pays the join being estimated (that is its point: certifying the
    * sketch); production pre-flights call [[joinSizeEstimate]], which
    * never touches the corpus-sized join. */
  def joinSizeChecked(a: DataFrame, b: DataFrame,
      keyA: String, keyB: String,
      depth: Int = 5, width: Int = 8192, seed: Long = 42L): DataFrame = {
    val est = joinSizeEstimate(a, b, keyA, keyB, depth, width, seed)
    val exact = a.select(col(keyA).as("__k"))
      .join(b.select(col(keyB).as("__k")), Seq("__k"))
      .agg(count(lit(1)).as("exact_join_rows"))
    est.crossJoin(exact)
      .withColumn("never_under",
        (col("est_join_rows") >= col("exact_join_rows")).cast("int"))
      .withColumn("bound_ok",
        (col("est_join_rows") <= col("exact_join_rows")
          + ceil(lit(math.E / width) * col("n_a") * col("n_b"))).cast("int"))
      .select(col("n_a"), col("n_b"), col("exact_join_rows"),
        col("est_join_rows"), col("never_under"), col("bound_ok"))
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
    // reserved internal alias for the per-key count: a key column
    // literally named "__skew_n" would collide with it (plain "n" is
    // fine — the spec verifies)
    require(!keyCols.contains("__skew_n"), "key column name __skew_n is reserved")
    val labels = percentiles.map(p =>
      "p" + (BigDecimal(p.toString) * 100).underlying.stripTrailingZeros
        .toPlainString.replace('.', '_') + "_key_rows")
    require(labels.distinct.size == labels.size,
      s"percentile labels collide: ${labels.mkString(",")}")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__skew_n"))
    val pAggs = percentiles.zip(labels).map { case (p, l) =>
      round(expr(s"percentile(__skew_n, ${p})"), 6).as(l)
    }
    val aggs = Seq(
      count(lit(1)).cast("double").as("n_keys"),
      sum(col("__skew_n")).cast("double").as("n_rows"),
      max(col("__skew_n")).cast("double").as("max_key_rows"),
      round(avg(col("__skew_n")), 6).as("mean_key_rows")) ++ pAggs
    val one = counts.agg(aggs.head, aggs.tail: _*)
      .withColumn("skew_ratio",
        round(col("max_key_rows") / col("mean_key_rows"), 6))
    val metrics = one.columns
    one.select(explode(array(metrics.toIndexedSeq.map(m =>
        struct(lit(m).as("metric"), col(m).as("value"))): _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }
}
