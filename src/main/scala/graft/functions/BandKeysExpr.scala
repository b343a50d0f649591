package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native row-local LSH band keys — the fused form of
  * [[graft.batch.Dedup.bandKeys]]'s HOF chain (tokenize → shingle
  * transform → 6 × array_min(transform(md5)) → 2 concat-md5 keys), the
  * second-hottest interpreted lambda chain in the sweep (it runs per
  * corpus row in qc1/qc2/qc4's pass 1 and per streaming doc in
  * IngestDedup).
  *
  * Value-identical to the SQL chain: window = lower(first 120 chars),
  * tokens split on single spaces (empties kept — Spark split semantics),
  * word-3-gram shingles via single-space concat_ws (which for split
  * pieces reconstructs the ORIGINAL byte range between the first and
  * last token — the implementation exploits this: every shingle is a
  * zero-copy (offset, length) slice of the window bytes), per-salt
  * minimum of md5 hex strings (hex of lowercase is order-isomorphic to
  * unsigned digest bytes, so minima are tracked on raw digests), band
  * keys = md5 of the 3 concatenated min-hex strings, null keys when
  * the shingle set is empty. Output
  * `array<struct<band:int, key:string>>`, exactly [[graft.batch.Dedup.bandKeys]]'s
  * shape. BandKeysExprSpec pins equivalence on the fixture corpus and
  * randomized payloads. Registered as SQL `band_keys`.
  */
case class BandKeysExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_keys requires a string arg, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("key", StringType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "band_keys"

  override def nullSafeEval(input: Any): Any =
    BandKeysExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.BandKeysExpr.compute($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
    copy(child = newChild)
}

object BandKeysExpr {

  private val ShingleChars = graft.batch.Dedup.ShingleChars
  private val HexDigits = "0123456789abcdef".toCharArray

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Unsigned lexicographic byte-array compare — the digest order that
    * matches lowercase-hex string order. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xFF; val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xF).toByte
      i += 1
    }
    out
  }

  def compute(text: UTF8String): ArrayData = {
    // lower(substring(text, 1, 120)) — code-point slice then lowercase,
    // Spark's evaluation order
    val window = text.substring(0, ShingleChars).toLowerCase
    val bytes = window.getBytes
    // token boundaries: split on the single-space regex = byte 0x20
    // (UTF-8 continuation bytes are ≥ 0x80, so the byte scan is exact
    // for any text); empties kept, like Spark's split(_, " ", -1)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) starts += i + 1
      i += 1
    }
    val nTok = starts.length
    def tokEnd(t: Int): Int = if (t + 1 < nTok) starts(t + 1) - 1 else bytes.length

    val md = digestLocal.get()
    // per-salt digest minima over the shingle set
    val mins = new Array[Array[Byte]](graft.batch.Dedup.NumHashes)
    val lastShingle = math.max(nTok - 3, 0)
    var s = 0
    while (s <= lastShingle) {
      val from = starts(s)
      val until = tokEnd(math.min(s + 2, nTok - 1))
      if (until > from) { // filter(length > 0)
        var j = 0
        while (j < mins.length) {
          md.reset()
          md.update(('0' + j).toByte); md.update('|'.toByte)
          md.update(bytes, from, until - from)
          val d = md.digest()
          if (mins(j) == null || less(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      s += 1
    }

    def bandKey(h0: Int, h1: Int, h2: Int): UTF8String =
      if (mins(h0) == null) null // md5(concat(null, …)) → null
      else {
        md.reset()
        md.update(hex(mins(h0))); md.update(hex(mins(h1))); md.update(hex(mins(h2)))
        UTF8String.fromBytes(hex(md.digest()))
      }

    new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](0, bandKey(0, 1, 2))),
      new GenericInternalRow(Array[Any](1, bandKey(3, 4, 5)))))
  }
}
