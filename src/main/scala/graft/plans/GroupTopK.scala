package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.graftshim.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.IntegerType

/** Logical group-wise top-k: for each distinct value of `keys`, the `k`
  * best child rows under `order`, plus a 1-based `rank` column.
  *
  * The composed formulation (`row_number().over(window) <= k`) sorts
  * every partition (Spark 4's `WindowGroupLimit` bounds its wire volume
  * too, but by sorting, O(n log n) + external-sorter memory); this
  * operator plans like an aggregation instead — a partial bounded-heap
  * pass before the exchange (≤ k rows per key per input partition
  * cross the wire, O(n log k) time, O(k·keys) state) and a final heap
  * merge after it, with no sort anywhere ([[PartialGroupTopKExec]] /
  * [[GroupTopKExec]]).
  *
  * Ties under `order` are broken arbitrarily; pass a total order (add a
  * unique tiebreak column) for deterministic output.
  */
case class GroupTopKPlan(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is born here, not read from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKPlan =
    copy(child = newChild)
}

/** Dataset-level entry point for the native group-wise top-k. */
object GroupTopK {
  /** For each distinct `keys` value in `df`, the `k` best rows by
    * `order` (ascending Columns — use `col(...).desc` for descending),
    * with a `rank` column 1..k. Registers the planner strategy
    * idempotently (shared with [[AsOf.ensureRegistered]]).
    */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    AsOf.ensureRegistered(spark)
    val plan = PlanBridge.analyzed(df)
    def attr(n: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(n)).getOrElse(throw new IllegalArgumentException(
        s"topK: no column '$n' among ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { c =>
      ColumnBridge.eagerExpression(c) match {
        case s: SortOrder => s
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    // resolve sort expressions' unresolved attrs against the child plan
    val resolved = sortOrders.map(_.transform {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        attr(u.name)
    }.asInstanceOf[SortOrder])
    require(!plan.output.exists(_.name.equalsIgnoreCase("rank")),
      "topK: input already has a 'rank' column — rename it first")
    val rankAttr = AttributeReference("rank", IntegerType, nullable = false)()
    PlanBridge.ofRows(spark,
      GroupTopKPlan(keys.map(attr), resolved, k, rankAttr, plan))
  }
}
