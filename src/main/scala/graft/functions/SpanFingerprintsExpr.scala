package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native span fingerprints — the fused form of the
  * `transform(sequence(0, (length(text) − W) div S), i ->
  * md5(cast(substring(text, 1 + S·i, W) as binary)))` chain shared by
  * the decontamination family (qd9/qd10/qd11's stride-16 corpus
  * windows, the eval sides' stride-1 exhaustive windows, qc1/qc2/qc4's
  * pass-1 `fps` signal): md5 hex of every W-char window at stride S.
  * Returns an EMPTY array below W characters (the SQL sites guard with
  * a length filter or IF — the expression makes the guard intrinsic).
  *
  * One pass, zero per-window string allocation: windows are code-point
  * ranges, resolved to byte ranges once (identity for all-ASCII text)
  * and fed to the digest as slices of the original bytes.
  * SpanFingerprintsSpec pins equivalence with the SQL chain on fixture
  * and randomized payloads at both strides. Registered as SQL
  * `span_fps(text, window, stride)`.
  */
case class SpanFingerprintsExpr(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window >= 1 && stride >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"span_fps requires window >= 1 and stride >= 1, got ($window, $stride)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_fps requires a string arg, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "span_fps"

  override def nullSafeEval(input: Any): Any =
    SpanFingerprintsExpr.compute(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.SpanFingerprintsExpr.compute($s, $window, $stride);"
    })

  override protected def withNewChildInternal(newChild: Expression): SpanFingerprintsExpr =
    copy(child = newChild)
}

object SpanFingerprintsExpr {

  private val HexDigits = "0123456789abcdef".toCharArray

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def hexUtf8(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(text: UTF8String, window: Int, stride: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    val nChars = text.numChars()
    if (nChars < window) return new GenericArrayData(Array.empty[Any])
    // byte offset of each char position; identity when all-ASCII
    val offsets: Array[Int] =
      if (nBytes == nChars) null
      else {
        val o = new Array[Int](nChars + 1)
        var b = 0; var c = 0
        while (b < nBytes) {
          o(c) = b
          val first = bytes(b) & 0xFF
          b += (if (first < 0x80) 1 else if (first < 0xE0) 2
                else if (first < 0xF0) 3 else 4)
          c += 1
        }
        o(nChars) = nBytes
        o
      }
    def byteAt(charPos: Int): Int =
      if (offsets == null) charPos else offsets(charPos)

    val md = digestLocal.get()
    val n = (nChars - window) / stride + 1
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val from = byteAt(i * stride)
      val until = byteAt(i * stride + window)
      md.reset()
      md.update(bytes, from, until - from)
      out(i) = hexUtf8(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}
