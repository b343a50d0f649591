package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DecodePlcWordsExpr, VectorDotExpr}
import graft.plans.{AsOfJoinStrategy, PushProbeFilterThroughAsOfJoin}

/** SparkSessionExtensions entry point: registers the engine's custom
  * functions, planner strategies, and optimizer rules at session build
  * time — `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  * (For an existing session use [[functions.GraftFunctions.register]] and
  * [[plans.AsOf.ensureRegistered]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("decode_plc_words"),
      new ExpressionInfo(classOf[DecodePlcWordsExpr].getName, "decode_plc_words"),
      (exprs: Seq[Expression]) => DecodePlcWordsExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDotExpr].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDotExpr(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => new AsOfJoinStrategy)
    e.injectOptimizerRule(_ => PushProbeFilterThroughAsOfJoin)
  }
}
