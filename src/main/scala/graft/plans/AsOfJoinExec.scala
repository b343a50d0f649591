package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Planner strategy for graft's custom operators: [[AsOfJoinPlan]] →
  * [[AsOfJoinExec]] and [[GroupTopKPlan]] → partial + final top-k
  * (aggregation-style split: the partial runs before the exchange
  * `EnsureRequirements` inserts for the final's distribution). Injected
  * via `GraftExtensions` or `AsOf.ensureRegistered`.
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case GroupTopKPlan(keys, order, k, rankAttr, child) =>
      GroupTopKExec(keys, order, k, rankAttr,
        PartialGroupTopKExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned streaming-merge as-of join.
  *
  * Declares `ClusteredDistribution` on the key for BOTH children and a
  * (key, time) sort within partitions, so `EnsureRequirements` plans
  * exactly one hash shuffle per side (or zero when an upstream exchange
  * already clusters on the key — the partitioning is reusable, unlike
  * the union+window formulation which forces its own exchange). The
  * merge itself is a single forward pass per partition: O(|probe| +
  * |reference|) with O(1) state — one buffered reference row — so no
  * per-key buffering, no spill, no skew amplification beyond what the
  * hash partitioning itself sees. Scales to 100 TB exactly like a
  * sort-merge join.
  *
  * Null times follow the natural ascending ordering (nulls first), so a
  * null-time reference row matches every probe of its key unless a
  * real-timed one supersedes it; and null KEYS compare equal to each
  * other (sort semantics), unlike SQL `=`. Filter nulls upstream when
  * SQL-equality parity matters (q29's sides are non-null by
  * construction).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // probe side passes through untouched: its partitioning and ordering
  // survive, so a downstream agg/join on the same key needs no exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (probeIter, refIter) =>
      val pKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val pTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRef: InternalRow = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOut, allOut)

      new Iterator[InternalRow] {
        // one-row lookahead on the reference side; rows are copied when
        // buffered because upstream sorters reuse their UnsafeRows
        private var ref: InternalRow = advance()
        private var matched: InternalRow = _
        private var matchedKey: UnsafeRow = _
        private def advance(): InternalRow =
          if (refIter.hasNext) refIter.next().copy() else null

        override def hasNext: Boolean = probeIter.hasNext

        override def next(): InternalRow = {
          val p = probeIter.next()
          val pk = pKeyProj(p)
          // consume reference rows that are final for this probe: keys
          // already passed (probe keys only grow), or same-key rows at
          // or before the probe time (each overwrites `matched` — the
          // last one standing is the latest-at-or-before)
          var scanning = ref != null
          while (scanning) {
            val c = keyOrd.compare(rKeyProj(ref), pk)
            if (c < 0) ref = advance()
            else if (c == 0 && timeOrd.compare(rTimeProj(ref), pTimeProj(p)) <= 0) {
              matched = ref; matchedKey = pk.copy(); ref = advance()
            } else scanning = false
            if (ref == null) scanning = false
          }
          if (matched != null && keyOrd.compare(matchedKey, pk) != 0) matched = null
          numOutputRows += 1
          resultProj(joined(p, if (matched == null) nullRef else matched))
        }
      }
    }
  }
}
