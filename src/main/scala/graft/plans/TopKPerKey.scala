package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.execution.SparkStrategy

/** Custom whole-operator: bounded top-k per key (SURVEY §4.3 preference
  * (c): LogicalPlan + Strategy + SparkPlan, registered via
  * SparkSessionExtensions).
  *
  * The Spark-native formulation of per-key top-k —
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k` —
  * SORTS every partition in full: O(n log n) in candidate count, all
  * candidates materialized. This operator keeps a k-bounded binary heap
  * per key instead: O(n log k) and only k rows per key retained, in two
  * phases like an aggregation — a partial (pre-shuffle, narrow) pass
  * prunes each map partition to k rows per key, the final (post-shuffle,
  * key-clustered) pass merges. The shuffle moves at most
  * mapPartitions·k rows per key instead of every candidate — the same
  * trick `TakeOrderedAndProject` plays globally, generalized per key.
  *
  * Output rows are NOT emitted in rank order (heap order); callers
  * needing ranks apply a window afterwards — over ≤ k rows per key,
  * which is the point.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // Pruning is per-key and in-place: rows neither move between
  // partitions nor change, so the child's clustering survives. Without
  // this override the exec reports UnknownPartitioning and every
  // downstream key-clustered consumer (the final TopK pass, the rank
  // window in rankedTopK) re-shuffles data that is already placed.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(sortOrder, childOutput)
      // per-key bounded heap: keep the k SMALLEST under rowOrd, so the
      // heap is a max-heap (reverse order) — evict the current worst.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, rowOrd.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      // partial (narrow) under final (clustered); EnsureRequirements
      // inserts the key-hash exchange between them.
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Installs the whole repo's Catalyst surface: the top-k strategy and
  * the (conf-gated, dormant-by-default) range-join rewrite rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => RangeJoinRewrite)
  }
}

object TopKPerKey {
  /** Ensure the strategy is available on this session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  /** Heap-prune to k rows per key, then rank 1..k with a window that
    * only ever sees ≤ k rows per key — the shared tail of every kNN
    * join path. Ordering must include full tiebreak columns so the heap
    * keeps exactly the rows the window would rank. */
  def rankedTopK(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String, orderAsc: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    rankedTopKMulti(df, Seq(keyCol), orderAsc, k)

  /** [[rankedTopK]] for a COMPOSITE key (e.g. hardNegatives'
    * (anchor, same_label) legs): same heap-prune + bounded rank
    * window, partitioned by all key columns. No rank filter needed:
    * the heap already bounds each group to k rows, so row_number can
    * never exceed k. */
  def rankedTopKMulti(
      df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String], orderAsc: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, row_number}
    val pruned = perKey(df, keyCols, orderAsc, k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderAsc.map(col): _*)
    pruned.withColumn("rank", row_number().over(w))
  }

  /** df rows reduced to the k smallest per key under the ascending
    * lexicographic order of `orderAsc` (give the same tiebreak columns
    * you would give a window, or boundary ties are arbitrary). */
  def perKey(
      df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String], orderAsc: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    install(spark)
    import org.apache.spark.sql.GraftBridge
    val plan = df.queryExecution.analyzed
    val keyExprs = keyCols.map(c => GraftBridge.expression(df(c)))
    val ord = orderAsc.map(c => SortOrder(GraftBridge.expression(df(c)),
      org.apache.spark.sql.catalyst.expressions.Ascending))
    GraftBridge.ofRows(spark, TopKPerKeyPlan(keyExprs, ord, k, plan))
  }
}
