package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DecodePlcWordsExpr, PhashExpr, VectorDotExpr}
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
    import graft.functions.GraftFunctions.arity
    e.injectFunction((
      FunctionIdentifier("decode_plc_words"),
      new ExpressionInfo(classOf[DecodePlcWordsExpr].getName, "decode_plc_words"),
      (exprs: Seq[Expression]) => DecodePlcWordsExpr(arity("decode_plc_words", 1, exprs).head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDotExpr].getName, "vec_dot"),
      (exprs: Seq[Expression]) => { val a = arity("vec_dot", 2, exprs); VectorDotExpr(a(0), a(1)) }))
    e.injectFunction((
      FunctionIdentifier("phash_blocks"),
      new ExpressionInfo(classOf[PhashExpr].getName, "phash_blocks"),
      (exprs: Seq[Expression]) => {
        val a = arity("phash_blocks", 2, exprs)
        PhashExpr(a(0), a(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"phash_blocks nBits must be an integer literal, got $other")
        })
      }))
    e.injectPlannerStrategy(_ => new AsOfJoinStrategy)
    e.injectOptimizerRule(_ => PushProbeFilterThroughAsOfJoin)
  }
}
