package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Int8 scalar quantization as a STORAGE format — the pair of native
  * expressions behind [[graft.batch.IvfIndex]]'s int8 cell layout
  * (qs8): [[Int8PackExpr]] quantizes a float/double vector into one
  * `binary` blob of signed bytes (1 byte per dimension — the 4× IO
  * lever a 100 TB embedding store pulls first; parquet stores BINARY
  * plain, whereas an `array<tinyint>` round-trips through INT32 pages
  * and per-element repetition levels), and [[Int8DotExpr]] scores two
  * packed blobs with an INTEGER dot product (exact, so both engines
  * agree bit-for-bit with no float-order caveats).
  *
  * Quantization rule = qs6_int8_quant's exactly (Similarity.scala),
  * which the DuckDB oracle restates in list lambdas: per-vector
  * symmetric scale (callers pass `max|x| / 127`),
  * `q_i = floor(x_i / scale + 0.5)` — the explicit floor-plus-half so
  * both engines round identically — giving |q| ≤ 127 by construction
  * for that scale. Malformed input → null, never a clamped or partial
  * blob: non-positive/NaN scale, a null element, or any q outside the
  * signed-byte range (possible only under a caller-supplied wrong
  * scale) null the whole pack; a length mismatch nulls the dot
  * ([[VectorDotExpr]]'s rule).
  */
case class Int8PackExpr(vec: Expression, scale: Expression) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = scale

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, scale.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int8_pack requires (array<float|double>, double), got ${l.sql}, ${r.sql}")
  }

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_pack"

  override def nullSafeEval(v: Any, s: Any): Any =
    Int8PackExpr.pack(v.asInstanceOf[ArrayData], s.asInstanceOf[Double], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("packed")
    nullSafeCodeGen(ctx, ev, (v, s) => {
      s"""
         |byte[] $r = graft.functions.Int8PackExpr.pack($v, (double) $s, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8PackExpr =
    copy(vec = newLeft, scale = newRight)
}

object Int8PackExpr {
  /** Null (not clamp, not partial) on any malformed input — a wrong
    * blob in the store would silently mis-rank every future search. */
  def pack(vec: ArrayData, scale: Double, isFloat: Boolean): Array[Byte] = {
    if (!(scale > 0) || java.lang.Double.isInfinite(scale)) return null
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val q = math.floor(x / scale + 0.5)
      // |q| ≤ 127 is the documented invariant under the caller's
      // max|x|/127 scale; q = −128 is reachable ONLY under a wrong
      // caller-supplied scale, so it gets the same outcome as every
      // other malformed case — null, never a stored byte (VERDICT r12)
      if (!(q >= -127 && q <= 127)) return null // also rejects NaN
      out(i) = q.toByte
      i += 1
    }
    out
  }
}

/** Integer dot product of two [[Int8PackExpr]] blobs → long. Exact:
  * |Σ q_a·q_b| ≤ dims · 127² needs only 22 bits at 64 dims — both
  * engines compute the identical integer, which is what lets qs8's
  * oracle hash-compare raw int8 scores with no float-summation-order
  * caveat. Length mismatch → null ([[VectorDotExpr]]'s rule). */
case class Int8DotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int8_dot requires two binary args, got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var s = 0L
    var i = 0
    while (i < x.length) {
      s += x(i).toLong * y(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    $s += ((long) $x[$i]) * ((long) $y[$i]);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8DotExpr =
    copy(left = newLeft, right = newRight)
}
