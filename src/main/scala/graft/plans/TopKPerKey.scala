package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Whole-operator custom plan: per-key top-k WITHOUT a per-key sort.
  *
  * The compositional form (`row_number` window + filter, q07) sorts every
  * key's full row set — at 100 TB the shuffle carries every row and each
  * task sorts its whole partition to keep k of them. This operator plans
  * as TWO physical stages, shaped like a partial/final aggregate:
  *
  *   partial: per input partition, a bounded k-heap per key — only
  *            `k · keys-per-partition` rows survive to the shuffle;
  *   final:   the same heaps after a hash exchange on the keys — exact
  *            per-key top-k, no sort anywhere, state bounded by k.
  *
  * This is the (c) rung of the custom-operator ladder (logical node +
  * strategy + physical node + optimizer rule via SparkSessionExtensions /
  * experimental methods), used when composition can't express the
  * OPERATOR'S COST — the semantics are expressible with a window, the
  * bounded-heap plan is not.
  *
  * The ordering must be TOTAL (include a tiebreaker column) for
  * deterministic output. Output rows are the surviving rows, unordered —
  * callers sort for presentation.
  *
  * Restriction: keys group by RAW binary equality (no floating-point
  * normalization — Spark's NormalizeFloatingNumbers rule does not know
  * this node), so a float/double key column containing both 0.0 and
  * -0.0 (or differing NaN bit patterns) would split a group the window
  * composition treats as one. Use integral/string keys, or normalize
  * float keys upstream.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKPerKey {

  /** Idempotent, thread-safe registration of BOTH the planner strategy and
    * the filter-pushdown rule on a live session. `extraStrategies` /
    * `extraOptimizations` setters are plain read-modify-writes on
    * session-shared state, so concurrent first uses from two threads could
    * otherwise lose or duplicate an entry; the lock serializes them.
    * (Session-build-time injection via `GraftExtensions` needs none of
    * this.) */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    synchronized {
      val exp = spark.experimental
      if (!exp.extraStrategies.contains(TopKStrategy))
        exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
      if (!exp.extraOptimizations.contains(PushFilterThroughTopK))
        exp.extraOptimizations =
          exp.extraOptimizations :+ PushFilterThroughTopK
    }

  /** API entry: top `k` rows per `keyCols` group under `orderCols`
    * (construct with `col(...).desc` / `.asc`; append a unique tiebreaker
    * for determinism). */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
            k: Int): DataFrame = {
    // self-registering (strategy + pushdown rule): session-mutable, so
    // callers (and operators composing this) need no setup step
    ensureRegistered(df.sparkSession)
    val keys = keyCols.map(UnresolvedAttribute(_))
    val sorts = orderCols.map(Bridge.toCatalyst).map {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerKey(keys, sorts, k, df.queryExecution.logical))
  }
}

/** Physical per-key bounded-heap selection. `partial = true` runs before
  * the exchange (any distribution, output is a superset candidate set);
  * `partial = false` requires clustering on the keys and emits the exact
  * top-k.
  *
  * MEMORY: heap state is k rows × DISTINCT KEYS SEEN IN THE PARTITION —
  * bounded by k per key, but the keys-per-partition factor matters: on a
  * near-unique key column it approaches the partition's row count. The
  * PARTIAL stage therefore FLUSHES: when held rows reach
  * `spark.graft.topk.partialMaxRows` (default 1M), it emits everything
  * held and starts fresh — correct because a partial's contract is only
  * "a superset containing each key's true top-k": every row it ever
  * dropped was dominated by k retained same-key rows, each of which is
  * either emitted in some flush or replaced by a strictly better row, so
  * k dominators always reach the final stage. The FINAL stage must be
  * exact and cannot flush; its state is k × distinct-keys-per-hash-
  * partition with no spill path — for near-unique keys prefer the window
  * composition, whose SortExec spills. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    val flushAt =
      if (partial)
        conf.getConfString("spark.graft.topk.partialMaxRows", "1048576")
          .toInt.max(1)
      else Int.MaxValue // final stage must be exact: never flush early
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(sortExprs, childOutput)
      new Iterator[InternalRow] {
        // per-key max-heap under `ord`: the root is the WORST survivor,
        // so a better row evicts it in O(log k); `held` counts rows
        // across all heaps (evictions replace, so only first-k inserts
        // grow it)
        private var heaps = mutable.HashMap.empty[UnsafeRow,
          mutable.PriorityQueue[UnsafeRow]]
        private var held = 0
        private var drain: Iterator[InternalRow] = Iterator.empty

        private def insert(row: InternalRow): Unit = {
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[UnsafeRow](
                ord.asInstanceOf[Ordering[UnsafeRow]])
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kLocal) {
            heap.enqueue(rowProj(row).copy()); held += 1
          } else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(rowProj(row).copy())
          }
        }

        private def flush(): Iterator[InternalRow] = {
          val old = heaps
          heaps = mutable.HashMap.empty
          held = 0
          old.valuesIterator.flatMap(_.iterator)
        }

        private def advance(): Unit = {
          while (!drain.hasNext && it.hasNext) {
            insert(it.next())
            if (held >= flushAt) drain = flush()
          }
          if (!drain.hasNext && !it.hasNext && held > 0) drain = flush()
        }

        override def hasNext: Boolean = { advance(); drain.hasNext }
        override def next(): InternalRow = { advance(); drain.next() }
      }
    }, preservesPartitioning = true)
  }
}

/** Plans [[TopKPerKey]] as partial → (exchange via required
  * distribution) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: a deterministic filter on ATTRIBUTE keys commutes
  * with per-key top-k (dropping whole groups never changes the survivors
  * of other groups), so push it below the operator where it can keep
  * descending toward the scan.
  *
  * The guards are load-bearing: (1) keys must be bare attributes — for a
  * derived key like `col % 10`, a filter on `col` touches only key
  * *references* yet distinguishes rows WITHIN a group, so pushing it
  * changes who competes; (2) the condition must be deterministic (a
  * pushed `rand()` would evaluate before selection instead of after —
  * same requirement as Spark's own PushDownPredicates); (3) non-key
  * filters never move. */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, t @ TopKPerKey(keys, _, _, child))
        if cond.deterministic &&
          keys.forall(_.isInstanceOf[Attribute]) &&
          f.references.nonEmpty &&
          f.references.subsetOf(
            org.apache.spark.sql.catalyst.expressions.AttributeSet(
              keys.flatMap(_.references))) =>
      t.copy(child = Filter(cond, child))
  }
}
