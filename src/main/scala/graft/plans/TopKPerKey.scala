package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Logical "top k rows per key under an ordering" — the §2.12(c)
  * whole-operator extension path taken all the way down: custom logical
  * node → [[TopKPerKeyStrategy]] → [[TopKPerKeyExec]] physical pair,
  * injected via `SparkSessionExtensions` ([[GraftExtensions]]).
  *
  * Why a custom operator at all: Spark's idiom for this —
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` —
  * shuffles EVERY row to its key's reducer and sorts the whole
  * partition before discarding all but k. The physical pair here bounds
  * rows per (partition, key) to k with a heap BEFORE the exchange (the
  * map-side combine top-k lacks in stock Spark), so shuffle volume is
  * ≤ k × keys × input-partitions instead of the corpus — at 100 TB the
  * difference between moving terabytes and megabytes. Heap memory per
  * task is k × (keys in that partition) rows.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical top-k-per-key: `partial = true` bounds each input partition
  * (no distribution requirement, runs before the shuffle);
  * `partial = false` requires `ClusteredDistribution(keys)` — Spark's
  * EnsureRequirements inserts the hash exchange — and produces the
  * exact per-key top k. Both phases run the same bounded-heap pass;
  * partial-then-final is correct because the final top k of a key is a
  * subset of every partition's local top k.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap under ord: head is the WORST kept row; a new row
      // replaces it when strictly better
      val heapOrd: Ordering[InternalRow] = ord
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < limit) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue()
              h.enqueue(row.copy())
            }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy lowering [[TopKPerKeyNode]] to the partial→final
  * [[TopKPerKeyExec]] pair (the exchange between them comes from the
  * final's required distribution).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top `k` rows per `keys` group under `order` ((column, ascending)
    * pairs; append a unique column for a deterministic result). The
    * DataFrame-level door to the custom operator.
    */
  def apply(df: DataFrame, keyNames: Seq[String],
            order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val node = TopKPerKeyNode(
      keyNames.map(UnresolvedAttribute(_)),
      order.map { case (c, asc) =>
        SortOrder(UnresolvedAttribute(c), if (asc) Ascending else Descending)
      },
      k, df.queryExecution.logical)
    org.apache.spark.sql.GraftSqlBridge.ofRows(df.sparkSession, node)
  }
}
