package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-support shim: materialize what an extensions class registers
  * (the build* methods are `private[sql]`). Lets a spec pin that
  * `graft.GraftExtensions` wires every component without constructing
  * a second SparkSession in the shared-session test JVM. */
object ExtensionsProbe {
  def probe(apply: SparkSessionExtensions => Unit, spark: SparkSession)
      : (Seq[String], Seq[String], Seq[String]) = {
    val e = new SparkSessionExtensions
    apply(e)
    val strategies = e.buildPlannerStrategies(spark).map(_.getClass.getSimpleName)
    val rules = e.buildOptimizerRules(spark).map(_.ruleName)
    val reg = e.registerFunctions(FunctionRegistry.builtin.clone())
    (strategies, rules, reg.listFunction().map(_.funcName))
  }
}
