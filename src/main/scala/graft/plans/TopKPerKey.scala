package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BaseOrdering, Descending, Expression, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator extension chain — the (c) tier of the custom-operator
  * ladder: a custom `LogicalPlan` node, a `Strategy` that plans it, and a
  * physical `SparkPlan` pair, injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  *
  * The operator: **partial top-k per key**. Spark's built-in spelling of
  * "top k rows per group" is a window `row_number() <= k` — which shuffles
  * EVERY row to its key's reducer and sorts whole partitions before
  * discarding all but k per key. At 100 TB that shuffle is the job. This
  * operator keeps a bounded k-row heap per key on the MAP side (the same
  * state bound as a partial hash aggregate), shuffles only the per-
  * partition survivors (≤ partitions × keys × k rows), and reduces with
  * the same heap on the key-clustered side. Global `TakeOrderedAndProject`
  * is this exact shape for ungrouped top-k; Spark has no per-key form —
  * hence the custom node rather than a composition.
  *
  * Determinism contract: the SortOrder list must be a TOTAL order per key
  * (include a unique tiebreaker column) — heaps keep "some k" among ties
  * otherwise. Output row ORDER within a key is unspecified (a set, like
  * any aggregate); sort downstream if order matters.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Optimizer rule for the custom node — the `Rule[LogicalPlan]` tier of
  * the extension ladder (injected via `injectOptimizerRule`): a Filter
  * that references ONLY grouping-key columns commutes with per-key top-k
  * (dropping whole key groups before or after the heaps selects the same
  * rows), so push it below the operator where it can reach the scan —
  * Catalyst's own pushdown rules don't know the custom node and would
  * otherwise stop at it, leaving the heaps to process groups the filter
  * throws away. Filters touching ORDER columns must NOT be pushed: they
  * would change which rows compete inside a group.
  */
object PushFilterThroughTopKPerKey
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: TopKPerKeyPlan)
        if cond.references.subsetOf(
             org.apache.spark.sql.catalyst.expressions.AttributeSet(
               t.keys.flatMap(_.references))) &&
           !org.apache.spark.sql.catalyst.expressions.SubqueryExpression
             .hasSubquery(cond) =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Plans the logical node as partial-exec → (exchange inserted by
  * EnsureRequirements) → final-exec, exactly like a two-phase aggregate.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key over one partition. `partial = true` runs
  * map-side on arbitrary input partitioning; `partial = false` declares
  * `ClusteredDistribution(keys)` so EnsureRequirements plants the shuffle,
  * after which per-key survivors from all map partitions meet in one task
  * and reduce to the true top k. State is O(keys-in-partition × k) rows —
  * the hash-aggregate bound; the shuffle carries only map-side survivors.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: BaseOrdering = RowOrdering.create(orderExprs, childOutput)
      // max-heap w.r.t. the sort order: head = worst currently-kept row
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = -ord.compare(a, b)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initialCapacity is allocated EAGERLY — a huge k (top-1M) must
          // not reserve a 1M-slot array per key; the queue grows as needed
          heap = new java.util.PriorityQueue[InternalRow](math.min(kLocal, 16) + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        numOutputRows += h.size()
        h.iterator().asScala
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing builder: resolves key/order names against the analyzed
  * child plan and hands Catalyst the custom node.
  */
object TopKPerKey {
  def apply(df: DataFrame, keyCols: Seq[String],
            orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderSpec.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keyCols.map(attr), order, k, analyzed))
  }
}
