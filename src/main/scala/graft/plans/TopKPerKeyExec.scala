package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Physical strategy for [[TopKPerKey]]: partial (map-side, pre-shuffle)
  * → exchange on the keys (inserted by EnsureRequirements from the final
  * node's required distribution) → final merge + rank emit.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyFinalExec(
        t.keys, t.order, t.k, t.rankAttr,
        TopKPerKeyPartialExec(t.keys, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap accumulation: at most k rows per key, kept in a
  * max-heap ordered by the sort order so the WORST retained row is at the
  * head and O(log k) to replace.
  */
private[plans] object TopKHeaps {
  def accumulate(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int): mutable.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy()); ()
          }
        case None =>
          val heap = new mutable.PriorityQueue[InternalRow]()(ord)
          heap.enqueue(row.copy())
          heaps.put(key.copy(), heap)
          ()
      }
    }
    heaps
  }
}

/** Map-side partial top-k: emits the ≤ k best rows per key per input
  * partition (order within the partial is irrelevant — the final pass
  * re-ranks). This is the operator's scale lever: the shuffle above it
  * carries at most k·keys rows per mapper instead of the whole table.
  *
  * State is BOUNDED: when the per-partition heap map exceeds
  * `graft.topk.partial.maxkeys` distinct keys, the current heaps are
  * FLUSHED downstream and accumulation restarts — the same
  * overflow-fallback a map-side hash-agg partial uses instead of
  * spilling. Flushing is always correct (dropping a row from a full heap
  * is final — k better rows exist in this partition — and emitting ≤ k
  * survivors per key per flush epoch is merely a looser partial; the
  * final pass re-filters), it only trades shuffle volume for memory on
  * pathological key cardinality. Without this cap, row_number()<=1 over a
  * near-unique key would buffer the whole partition where WindowExec's
  * external sort would have spilled.
  */
final case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val orderExprs = order
    val kk = k
    val maxKeys = conf
      .getConfString(TopKPerKeyPartialExec.MaxKeysFlag, "1000000").toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // identity unsafe projection: guarantee UnsafeRow output for the
      // exchange regardless of what the heap stored
      val out = UnsafeProjection.create(childOutput, childOutput)
      new Iterator[InternalRow] {
        private val heaps =
          mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        private val pending = mutable.Queue.empty[InternalRow]
        private def flush(): Unit = {
          heaps.valuesIterator.foreach(h => h.foreach(pending.enqueue(_)))
          heaps.clear()
        }
        private def pump(): Unit = {
          while (pending.isEmpty && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(heap) =>
                if (heap.size < kk) heap.enqueue(row.copy())
                else if (ord.compare(row, heap.head) < 0) {
                  heap.dequeue(); heap.enqueue(row.copy()); ()
                }
              case None =>
                if (heaps.size >= maxKeys) flush()
                val heap = new mutable.PriorityQueue[InternalRow]()(ord)
                heap.enqueue(row.copy())
                heaps.put(key.copy(), heap)
                ()
            }
          }
          if (pending.isEmpty && !iter.hasNext && heaps.nonEmpty) flush()
        }
        override def hasNext: Boolean = { pump(); pending.nonEmpty }
        override def next(): InternalRow = { pump(); out(pending.dequeue()) }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

object TopKPerKeyPartialExec {
  /** Distinct-key cap per partition before a partial flush. */
  val MaxKeysFlag = "graft.topk.partial.maxkeys"
}

/** Final top-k merge: requires clustering on the keys (EnsureRequirements
  * inserts the hash exchange), re-accumulates the partials' survivors into
  * per-key heaps, then emits each key's rows best-first with their 1-based
  * rank appended — the same output shape as the Window row_number form.
  *
  * Working-set envelope: k rows per distinct key in the reduce partition —
  * the input is already capped by the partials, and k·keys is strictly
  * less than what WindowExec would sort for the same answer, but it is
  * held in memory without a spill path. The rewrite's cardinality guard
  * ([[TopKRewrite.safeCardinality]]) therefore declines the rewrite — the
  * Window form's external sort handles it — whenever it cannot show
  * k·keys fits the `graft.topk.maxkeyrows` budget; DIRECT construction of
  * [[TopKPerKey]] bypasses that guard and inherits this envelope.
  */
final case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outAttrs = output
    val keyExprs = keys
    val orderExprs = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      TopKHeaps.accumulate(iter, keyProj, ord, kk).valuesIterator.flatMap { heap =>
        // dequeueAll drains worst-first; reverse → rank order
        val best = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          proj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}
