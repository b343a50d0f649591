package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.PlanBridge

/** Logical as-of join: for each PROBE (left) row, the latest REFERENCE
  * (right) row with equal key and `refTime <= probeTime`; reference
  * columns are null when no such row exists (DuckDB `ASOF LEFT JOIN`
  * semantics). This is the whole-operator tier of SURVEY §4's extension
  * ladder — a first-class Catalyst node rather than the union+window
  * composition in `Relational.q8_asof` — so the optimizer can reason
  * about it (see [[PushProbeFilterThroughAsOfJoin]]) and the planner can
  * pick the co-partitioned merge physical operator ([[AsOfJoinExec]]).
  *
  * Probe rows map 1:1 to output rows; reference attributes come back
  * nullable (same exprIds, like Spark's outer joins).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push probe-only conjuncts of a Filter above an as-of
  * join below it. Safe because probe rows map 1:1 to output rows;
  * reference-side predicates must NOT move (they would change which row
  * is "latest"). At 100 TB this is the difference between shuffling all
  * probe rows and shuffling the selected ones.
  */
object PushProbeFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Dataset-level entry point for the native as-of join. */
object AsOf {
  /** Idempotently register the strategy + rule on an existing session
    * (sessions built with `spark.sql.extensions=graft.GraftExtensions`
    * get them at build time instead).
    */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val em = PlanBridge.experimental(spark)
    if (!em.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      em.extraStrategies = em.extraStrategies :+ new AsOfJoinStrategy
    if (!em.extraOptimizations.contains(PushProbeFilterThroughAsOfJoin))
      em.extraOptimizations = em.extraOptimizations :+ PushProbeFilterThroughAsOfJoin
  }

  /** For each `probe` row, attach the latest `reference` row with
    * `reference(refKey) == probe(probeKey)` and
    * `reference(refTime) <= probe(probeTime)` (nulls when none).
    * Column names must be disjoint if you select by name afterwards.
    * Each side is re-aliased with fresh exprIds so self-joins (both
    * sides derived from one table) are unambiguous.
    */
  def join(probe: DataFrame, reference: DataFrame,
           probeKey: String, refKey: String,
           probeTime: String, refTime: String): DataFrame = {
    val spark = probe.sparkSession
    ensureRegistered(spark)
    def freshen(df: DataFrame): LogicalPlan = {
      val p = PlanBridge.analyzed(df)
      Project(p.output.map(a => Alias(a, a.name)()), p)
    }
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(n)).getOrElse(throw new IllegalArgumentException(
        s"asof: no column '$n' among ${p.output.map(_.name).mkString(", ")}"))
    val l = freshen(probe)
    val r = freshen(reference)
    val (lk, rk) = (attr(l, probeKey), attr(r, refKey))
    val (lt, rt) = (attr(l, probeTime), attr(r, refTime))
    // this plan bypasses the analyzer (it is constructed resolved), so
    // the implicit-cast safety net is gone: mismatched types would hash
    // keys into different partitions / compare raw bytes wrongly and
    // return silently wrong rows. Fail loudly instead.
    def sameType(what: String, a: Attribute, b: Attribute): Unit =
      require(a.dataType == b.dataType,
        s"asof: $what types must match exactly, got ${a.name}: ${a.dataType.sql} vs " +
          s"${b.name}: ${b.dataType.sql} — cast one side before joining")
    sameType("key", lk, rk)
    sameType("time", lt, rt)
    PlanBridge.ofRows(spark, AsOfJoinPlan(l, r, Seq(lk), Seq(rk), lt, rt))
  }
}
