package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `nBits`-block average-hash of a payload string — the fused
  * form of [[graft.batch.Multimodal.withPhashN]]'s SQL HOF chain
  * (transform → aggregate → aggregate over a struct array), which was
  * the hottest interpreted higher-order chain in the 87-query sweep
  * (VERDICT r10: ~3–4 s of cross-query megamorphic lambda dispatch
  * that an isolated run never shows, plus real per-row allocation of
  * the intermediate struct array even in isolation).
  *
  * Value-identical to the SQL chain on the fixture alphabet: block b
  * spans character positions [b·L/nBits, (b+1)·L/nBits) (floor
  * division, L = character length), its intensity is the sum of
  * `ascii(char)` code points, the whole-payload mean is
  * Σintensity / L, and bit b is set when block b's mean intensity
  * exceeds it — integer arithmetic only, so the DuckDB oracle's
  * `ord`/`//` chain reproduces every bit (bit 63 = 1L << 63 wraps to
  * Long.MinValue, the two's-complement pattern both engines share).
  * Null when the input is null or shorter than nBits characters
  * (sub-block payloads are unhashable at that resolution), exactly the
  * SQL chain's IF guard. One pass over the bytes, zero allocations on
  * the all-ASCII fast path; preference-ladder step (b) like
  * [[VectorDotExpr]]. Registered as SQL `phash_blocks`.
  */
case class PhashExpr(child: Expression, nBits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if nBits >= 1 && nBits <= 64 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"phash_blocks requires 1 <= nBits <= 64, got $nBits")
    case t => TypeCheckResult.TypeCheckFailure(
      s"phash_blocks requires a string arg, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phash_blocks"

  override def nullSafeEval(input: Any): Any =
    PhashExpr.compute(input.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val boxed = ctx.freshName("ph")
      s"""
         |java.lang.Long $boxed = graft.functions.PhashExpr.compute($s, $nBits);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PhashExpr =
    copy(child = newChild)
}

object PhashExpr {

  /** The block fold, shared by interpreted eval and the generated
    * code. Character positions count CODE POINTS (Spark `length` /
    * `substring` semantics); per-character intensity is the code
    * point, which equals Spark's `ascii()` and DuckDB's `ord()` on
    * every ASCII payload (the fixtures' alphabet — the engines already
    * diverge from EACH OTHER beyond it). Returns null (boxed) below
    * nBits characters. */
  def compute(s: UTF8String, nBits: Int): java.lang.Long = {
    val nb = s.numBytes()
    val L = s.numChars().toLong
    if (L < nBits) return null
    val sums = new Array[Long](nBits)
    var total = 0L
    if (nb == L) {
      // all-ASCII fast path: byte index == character position,
      // byte value == code point
      var b = 0
      while (b < nBits) {
        var pos = b * L / nBits
        val end = (b + 1) * L / nBits
        var acc = 0L
        while (pos < end) { acc += s.getByte(pos.toInt); pos += 1 }
        sums(b) = acc
        total += acc
        b += 1
      }
    } else {
      val str = s.toString
      var i = 0
      var pos = 0L
      var b = 0
      var nextBound = L / nBits // character position where block 1 starts
      while (i < str.length) {
        val cp = str.codePointAt(i)
        while (pos >= nextBound && b < nBits - 1) {
          b += 1
          nextBound = (b + 1).toLong * L / nBits
        }
        sums(b) += cp
        total += cp
        i += Character.charCount(cp)
        pos += 1
      }
    }
    val m = total / L
    var ph = 0L
    var b = 0
    while (b < nBits) {
      val n = (b + 1).toLong * L / nBits - b.toLong * L / nBits
      if (sums(b) / n > m) ph |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(ph)
  }
}
