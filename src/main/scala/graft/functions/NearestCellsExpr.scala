package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native top-p nearest-centroid selection — the fused form of
  * IvfIndex's `scoredCells` → `array_sort`/`aggregate` HOF fold, which
  * is the hot inner loop of EVERY embedding operator's probe stage
  * (qd13/qd16/qc2/qc4/qd15's candidate generation, qs3's assignment,
  * IvfIndex build/append/search): per corpus row it evaluated an
  * interpreted lambda per centroid, allocated a (nrc, cid) struct per
  * centroid, and then sorted or folded the C-element array — at
  * production √N cell counts the per-element dispatch dominates the
  * 64-wide dot product itself.
  *
  * Semantics are IvfIndex's exactly, pinned by NearestCellsSpec
  * against the HOF forms on the full fixture corpus plus randomized
  * tie fixtures:
  *   - score = dot(ce, emb) / (cn · nrm), dot accumulated left-to-right
  *     in double like [[VectorDotExpr]];
  *   - rounded to 6 dp with the same BigDecimal.valueOf(...).setScale
  *     (HALF_UP) path Spark's `round` takes (NaN/Inf pass through), so
  *     near-ties collapse identically in both engines;
  *   - order = (rcos DESC, cid ASC), where −0.0 == +0.0 so a
  *     round()-produced −0.0 cannot steal a tie (the +0.0-subtraction
  *     trick in scoredCells, inherited);
  *   - a malformed centroid (dim mismatch or null element — where the
  *     HOF's VectorDotExpr dot is null) is EXCLUDED from the result,
  *     exactly like topCells' NaN filter and bestCellHof's strict-<
  *     fold — a partial or fabricated score can never win a probe slot;
  *   - output = the first min(p, C) well-formed cids in that order,
  *     `array<long>` (empty when the quantizer is, or when every entry
  *     is malformed — callers explode to zero rows, or coalesce
  *     element 1 to −1 for bestCell's sentinel).
  *
  * One pass per row, two small primitive arrays of insertion state,
  * zero per-centroid allocation beyond the rounding BigDecimal (which
  * the HOF chain also paid inside `round`). Registered as SQL
  * `nearest_cells(cs, emb, nrm, p)`.
  */
case class NearestCellsExpr(cs: Expression, emb: Expression, nrm: Expression,
    p: Int, rounded: Boolean = true) extends TernaryExpression {

  override def first: Expression = cs
  override def second: Expression = emb
  override def third: Expression = nrm

  override def checkInputDataTypes(): TypeCheckResult = (cs.dataType, emb.dataType, nrm.dataType) match {
    case (ArrayType(StructType(fs), _), ArrayType(FloatType | DoubleType, _), DoubleType)
        if fs.length == 3 && fs(0).dataType == LongType &&
          fs(1).dataType.isInstanceOf[ArrayType] && fs(2).dataType == DoubleType =>
      if (p >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"nearest_cells requires p >= 1, got $p")
    case (a, b, c) => TypeCheckResult.TypeCheckFailure(
      "nearest_cells requires (array<struct<cid:long, ce:array<float|double>, cn:double>>, " +
        s"array<float|double>, double), got ${a.sql}, ${b.sql}, ${c.sql}")
  }

  private def embIsFloat: Boolean =
    emb.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def ceIsFloat: Boolean =
    cs.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fields(1).dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(csV: Any, embV: Any, nrmV: Any): Any =
    NearestCellsExpr.compute(csV.asInstanceOf[ArrayData], embV.asInstanceOf[ArrayData],
      nrmV.asInstanceOf[Double], p, rounded, embIsFloat, ceIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, e, n) => {
      s"${ev.value} = graft.functions.NearestCellsExpr.compute(" +
        s"$c, $e, (double) $n, $p, $rounded, $embIsFloat, $ceIsFloat);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCellsExpr =
    copy(cs = newFirst, emb = newSecond, nrm = newThird)
}

object NearestCellsExpr {

  /** Spark `round(x, 6)`'s double path: BigDecimal.valueOf (decimal
    * repr) → setScale HALF_UP; NaN/Inf unchanged. */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Spark's nan-safe double compare: NaN > everything, −0.0 == +0.0. */
  private def nanSafeLess(a: Double, b: Double): Boolean =
    if (a < b) true
    else if (a > b) false
    else if (a == b) false
    else !java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b) // a < NaN

  // scalastyle:off parameter.number
  def compute(cs: ArrayData, emb: ArrayData, nrm: Double, p: Int,
      rounded: Boolean, embFloat: Boolean, ceFloat: Boolean): ArrayData = {
    val nC = cs.numElements()
    val d = emb.numElements()
    val k = math.min(p, nC)
    // top-k insertion state ordered ASC by (nrc, cid), nrc = 0 − rounded
    // cosine — the HOF form's EXACT sort key (so NaN scores land last
    // under the nan-safe order, and +0.0-subtraction collapses −0.0)
    val nrcs = new Array[Double](k)
    val cids = new Array[Long](k)
    var count = 0
    var i = 0
    while (i < nC) {
      val row = cs.getStruct(i, 3)
      val cid = row.getLong(0)
      val ce = row.getArray(1)
      val cn = row.getDouble(2)
      // malformed centroid (dim mismatch or null element — where the
      // HOF twin's VectorDotExpr returns null) → NaN score, which the
      // insertion below EXCLUDES, mirroring topCells' NaN filter and
      // bestCellHof's strict-< (a partial dot would silently mis-rank)
      var dot = 0.0
      var ok = ce.numElements() == d
      var j = 0
      while (ok && j < d) {
        if (ce.isNullAt(j) || emb.isNullAt(j)) ok = false
        else {
          val x = if (ceFloat) ce.getFloat(j).toDouble else ce.getDouble(j)
          val y = if (embFloat) emb.getFloat(j).toDouble else emb.getDouble(j)
          dot += x * y
          j += 1
        }
      }
      var rc = if (ok) dot / (cn * nrm) else Double.NaN
      if (ok && rounded) rc = round6(rc)
      val nrc = 0d - rc
      // candidate beats slot s iff (nrc, cid) < (nrcs(s), cids(s));
      // the insertion state never holds NaN (excluded below), so plain
      // == covers the ±0.0 tie and nanSafeLess reduces to <
      def beats(s: Int): Boolean =
        nanSafeLess(nrc, nrcs(s)) || (nrc == nrcs(s) && cid < cids(s))
      if (!java.lang.Double.isNaN(nrc) && (count < k || beats(count - 1))) {
        var pos = if (count < k) count else k - 1
        while (pos > 0 && beats(pos - 1)) {
          nrcs(pos) = nrcs(pos - 1); cids(pos) = cids(pos - 1)
          pos -= 1
        }
        nrcs(pos) = nrc; cids(pos) = cid
        if (count < k) count += 1
      }
      i += 1
    }
    val out = new Array[Any](count)
    i = 0
    while (i < count) { out(i) = cids(i); i += 1 }
    new GenericArrayData(out)
  }
  // scalastyle:on parameter.number
}
