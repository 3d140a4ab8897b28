package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import scala.collection.mutable

/** Whole-operator custom plan demonstration (SURVEY.md §7.5 ladder (c):
  * LogicalPlan + SparkStrategy + SparkPlan, injected via
  * SparkSessionExtensions): per-key top-k with partial pruning.
  *
  * The DataFrame idiom — `row_number().over(partitionBy(key).orderBy(ord))`
  * then `filter(rn <= k)` — shuffles EVERY input row before any row is
  * dropped. At 100 TB that shuffle is the job. This operator plans as
  * partial-topk → exchange → final-topk (the same shape Catalyst gives
  * aggregates): each partition keeps at most k rows per key in a bounded
  * heap, so the exchange carries ≤ k·partitions rows per key.
  */
final case class TopKPerKeyNode(
    k: Int, keys: Seq[Expression], order: Seq[SortOrder], child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Memory contract (the part that must survive a 100 TB run with
  * high-cardinality keys — e.g. exact dedup via the rank=1 idiom, where
  * nearly every key is distinct):
  *
  *  - PARTIAL: bounded heaps with FLUSH — when the buffered row count
  *    passes [[TopKPerKeyExec.maxBufferedRows]], emit everything and start
  *    over. A partial stage may emit a superset (the final stage prunes
  *    exactly), so flushing is always correct; memory is bounded regardless
  *    of key cardinality, and on hostile inputs the stage degrades toward a
  *    pass-through instead of an OOM.
  *  - FINAL: requires input sorted by (keys, order) — EnsureRequirements
  *    inserts a spillable external SortExec after the exchange — and
  *    streams each key group, emitting the first k rows. O(1) state beyond
  *    the sort; never holds a partition's keys in memory the way a
  *    heap-map would.
  */
final case class TopKPerKeyExec(
    k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    // EnsureRequirements inserts the hash exchange between partial and final
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  private def groupedOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) ++ order
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(groupedOrdering)
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupedOrdering

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    if (partial) Map("numFlushes" ->
      org.apache.spark.sql.execution.metric.SQLMetrics.createMetric(
        sparkContext, "mid-stream buffer flushes"))
    else Map.empty

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    if (partial) {
      val maxBuffered = TopKPerKeyExec.maxBufferedRows
      val flushMetric = longMetric("numFlushes")
      child.execute().mapPartitions({ it =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val ord = RowOrdering.create(sortOrder, childOutput)
        // max-heap per key: root = worst kept row (eviction candidate)
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        var buffered = 0
        def flush(): Iterator[InternalRow] = {
          val out = heaps.values.toArray.iterator.flatMap(_.iterator)
          heaps.clear(); buffered = 0
          out
        }
        val pruned = it.flatMap { row =>
          val key = keyProj(row)
          val heap = heaps.getOrElse(key, null) match {
            case null =>
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              heaps.put(key.copy(), h)
              h
            case h => h
          }
          if (heap.size < kLocal) { heap.enqueue(row.copy()); buffered += 1 }
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
          if (buffered >= maxBuffered) { flushMetric += 1; flush() } else Iterator.empty
        }
        pruned ++ new Iterator[InternalRow] {
          private var tail: Iterator[InternalRow] = null
          private def t: Iterator[InternalRow] = {
            if (tail == null) tail = flush() // materialized AFTER pruned drains
            tail
          }
          def hasNext: Boolean = t.hasNext
          def next(): InternalRow = t.next()
        }
      }, preservesPartitioning = true)
    } else {
      child.execute().mapPartitions({ it =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // rows arrive grouped by key (required ordering): stream and count
        var curKey: UnsafeRow = null
        var emitted = 0
        it.flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); emitted = 0 }
          if (emitted < kLocal) { emitted += 1; Iterator.single(row) }
          else Iterator.empty
        }
      }, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyExec {
  /** Partial-stage flush threshold (buffered rows per task). Bounds task
    * memory at roughly this many UnsafeRow copies independent of key
    * cardinality. Session-scoped override: `spark.conf.set(
    * "graft.topk.maxBufferedRows", n)` — read per execution on the driver
    * (SQLConf.get), so concurrent sessions keep independent values.
    * Malformed or nonpositive settings fall back to the default rather
    * than failing the query or degrading to per-row flushing.
    */
  def maxBufferedRows: Int = {
    val default = 1 << 18
    scala.util.Try(org.apache.spark.sql.internal.SQLConf.get
        .getConfString("graft.topk.maxBufferedRows", default.toString).toInt)
      .toOption.filter(_ > 0).getOrElse(default)
  }
}

object TopKPerKey {
  /** Top-k rows per key group, ordered by `orderCols` ((name, ascending)).
    * Provide a tiebreaker column for deterministic results.
    */
  def apply(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"topKPerKey needs k > 0 (got $k)") // exec heaps assume non-empty capacity
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val order = orderCols.map { case (n, asc) =>
      if (asc) SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Descending)
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(k, keyCols.map(attr), order, plan))
  }
}
