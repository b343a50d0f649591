package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Shared bounded-heap pass: for each key in the incoming partition,
  * keep the `k` best rows under `ord`. Memory is O(k · distinct keys in
  * partition) copied rows — the ranking analog of a hash-aggregate
  * buffer. */
private[plans] object TopKHeaps {
  def reduce(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
      ord: Ordering[InternalRow], k: Int): mutable.Map[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    // PriorityQueue dequeues the max per its ordering; under `ord` the
    // worst row IS the greatest (best sorts first), so `ord` itself
    // makes pq.head the eviction candidate
    val heaps = mutable.Map.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(pq) =>
          if (pq.size < k) pq.enqueue(row.copy())
          else if (ord.lt(row, pq.head)) { pq.dequeue(); pq.enqueue(row.copy()) }
        case None =>
          val pq = mutable.PriorityQueue.empty(ord)
          pq.enqueue(row.copy())
          heaps.put(key.copy(), pq)
      }
    }
    heaps
  }
}

/** Map-side partial top-k: no distribution requirement, emits ≤ k rows
  * per key per input partition (unranked — ranks need the global view).
  */
case class PartialGroupTopKExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): PartialGroupTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val ks = keys; val os = order; val kk = k; val out = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, out)
      val ord = RowOrdering.create(os, out)
      TopKHeaps.reduce(iter, keyProj, ord, kk).valuesIterator.flatMap { pq =>
        numOutputRows += pq.size
        pq.iterator
      }
    }, preservesPartitioning = true)
  }
}

/** Final top-k after clustering by key: merges the partial survivors
  * and emits each key's rows best-first with rank 1..k appended. */
case class GroupTopKExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val ks = keys; val os = order; val kk = k
    val childOut = child.output; val allOut = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, childOut)
      val ord = RowOrdering.create(os, childOut)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      TopKHeaps.reduce(iter, keyProj, ord, kk).valuesIterator.flatMap { pq =>
        // dequeueAll yields worst-first; reverse for best-first ranking
        val best = pq.dequeueAll.reverse
        numOutputRows += best.size
        best.iterator.zipWithIndex.map { case (row, i) =>
          val rank = new GenericInternalRow(1)
          rank.setInt(0, i + 1)
          resultProj(joined(row, rank))
        }
      }
    }, preservesPartitioning = true)
  }
}
