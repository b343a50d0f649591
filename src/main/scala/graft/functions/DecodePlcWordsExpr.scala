package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the PLC word decode (F1,
  * Prensas.py:450-465): `array<int>` of 16-bit words → ASCII string,
  * low byte first, NUL bytes stripped, null words skipped.
  *
  * Exactly equivalent to [[PlcFunctions.decodePlcWords]] (the built-in
  * composition) — this is the preference-ladder step (b): a single
  * fused expression with `doGenCode`, replacing a transform +
  * char/concat + array_join + regexp_replace pipeline with one tight
  * loop and zero regex work. Registered as SQL `decode_plc_words` via
  * [[GraftFunctions.register]] / [[graft.GraftExtensions]].
  */
case class DecodePlcWordsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decode_plc_words requires array<int>, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_plc_words"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null words vanish (array_join skips nulls)
        val w = arr.getInt(i)
        val lo = java.lang.Math.floorMod(w, 256)
        val hi = java.lang.Math.floorMod(java.lang.Math.floorDiv(w, 256), 256)
        if (lo != 0) sb.append(lo.toChar)
        if (hi != 0) sb.append(hi.toChar)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      s"""
         |java.lang.StringBuilder $sb = new java.lang.StringBuilder($arr.numElements() * 2);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    int $w = $arr.getInt($i);
         |    int $lo = java.lang.Math.floorMod($w, 256);
         |    int $hi = java.lang.Math.floorMod(java.lang.Math.floorDiv($w, 256), 256);
         |    if ($lo != 0) $sb.append((char) $lo);
         |    if ($hi != 0) $sb.append((char) $hi);
         |  }
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
