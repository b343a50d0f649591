package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (`ExpressionUtils`); this shim lives under `org.apache.spark.sql`
  * solely to re-export the two conversions for graft's custom
  * expressions — the standard pattern for Catalyst extension
  * libraries. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → catalyst conversion. `expression` wraps the
    * column-node tree lazily (resolved during analysis); plans built
    * OUTSIDE the analyzer (graft.plans.*) need the catalyst tree now —
    * e.g. to see a `.desc` Column's SortOrder and resolve its
    * attributes by hand. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
