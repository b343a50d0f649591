package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

/** SQL-surface registration for the engine's custom functions, so
  * `spark.sql("SELECT decode_plc_words(words) ...")` works alongside
  * the Scala Column API.
  *
  * `decode_plc_words` binds to the native codegen expression
  * ([[DecodePlcWordsExpr]]); the others are SQL expression macros —
  * templates parsed once by the session parser with `__aN`
  * placeholders substituted by the call arguments, so they expand into
  * ordinary built-in expression trees Catalyst optimizes like any
  * other (no UDF boundary).
  */
object GraftFunctions {

  /** Column API for the native decode expression. */
  def decode_plc_words(c: Column): Column = column(DecodePlcWordsExpr(expression(c)))

  /** Column API for the native dot product ([[VectorDotExpr]]). */
  def vec_dot(a: Column, b: Column): Column = column(VectorDotExpr(expression(a), expression(b)))

  /** Quantize+pack a float/double vector into one int8 binary blob
    * (scale = caller-chosen, conventionally max|x|/127 — qs6's rule). */
  def int8_pack(vec: Column, scale: Column): Column =
    column(Int8PackExpr(expression(vec), expression(scale)))

  /** Exact integer dot of two int8_pack blobs. */
  def int8_dot(a: Column, b: Column): Column =
    column(Int8DotExpr(expression(a), expression(b)))

  /** Column API for the native block average-hash ([[PhashExpr]]). */
  def phash_blocks(c: Column, nBits: Int): Column = column(PhashExpr(expression(c), nBits))

  /** Column API for the native LSH band keys ([[BandKeysExpr]]). */
  def band_keys(c: Column): Column = column(BandKeysExpr(expression(c)))

  /** Column API for the native top-p centroid probe ([[NearestCellsExpr]]). */
  def nearest_cells(cs: Column, emb: Column, nrm: Column, p: Int,
      rounded: Boolean = true): Column =
    column(NearestCellsExpr(expression(cs), expression(emb), expression(nrm), p, rounded))

  /** Column API for the native span fingerprints ([[SpanFingerprintsExpr]]). */
  def span_fps(c: Column, window: Int, stride: Int): Column =
    column(SpanFingerprintsExpr(expression(c), window, stride))

  /** Column API for the native BPE replay encoder ([[BpeEncodeExpr]]);
    * no SQL registration — the ranked merge list is plan state, not
    * something SQL literals can carry at 32k merges. */
  def bpe_encode(word: Column, merges: Seq[(Int, String, String)]): Column =
    column(BpeEncodeExpr(expression(word), merges))

  /** Column API for the native Bloom membership test
    * ([[BloomMightContainExpr]]); no SQL registration — the filter is a
    * runtime object, not something SQL literals can carry. */
  def bloom_might_contain(c: Column, bf: org.apache.spark.util.sketch.BloomFilter): Column =
    column(BloomMightContainExpr(expression(c), bf))

  /** Build a Bloom filter over `df(colName)` sized from the ACTUAL
    * build-side cardinality (one cheap count job over the — by
    * construction — small/selective side) instead of a fixed capacity.
    * A filter saturated past its expectedNumItems degrades toward
    * fpp→1 and silently loses the map-side pruning that is a
    * bloom-join's entire point; sizing from the data keeps the
    * advertised fpp at any scale. `floorItems` guards the degenerate
    * empty/near-empty build side. */
  def sizedBloomFilter(
      df: org.apache.spark.sql.DataFrame,
      colName: String,
      fpp: Double = 0.01,
      floorItems: Long = 1024L): org.apache.spark.util.sketch.BloomFilter = {
    val n = df.select(colName).count()
    df.stat.bloomFilter(colName, math.max(n, floorItems), fpp)
  }

  private def sqlMacro(spark: SparkSession, template: String): Seq[Expression] => Expression = {
    val parsed = spark.sessionState.sqlParser.parseExpression(template)
    exprs =>
      parsed.transformUp {
        case a: UnresolvedAttribute
            if a.nameParts.length == 1 && a.nameParts.head.startsWith("__a") =>
          exprs(a.nameParts.head.drop(3).toInt)
        // identifiers inside lambda bodies parse as lambda variables
        case v: UnresolvedNamedLambdaVariable
            if v.nameParts.length == 1 && v.nameParts.head.startsWith("__a") =>
          exprs(v.nameParts.head.drop(3).toInt)
      }
  }

  /** The padded-string fragment of encode (odd length → NUL pad). */
  private val Padded =
    "concat(__a0, if(pmod(length(__a0), 2) = 1, char(0), ''))"

  /** Arity guard: a clear message instead of an IndexOutOfBounds from
    * the builder lambda when SQL passes the wrong argument count. */
  private[graft] def arity(name: String, n: Int, exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n,
      s"$name requires exactly $n argument(s), got ${exprs.length}")
    exprs
  }

  /** Fold a foldable int argument of a native-expression builder.
    * Guarded on `foldable` so a column argument (e.g.
    * `nearest_cells(…, p_col)`) raises the intended message instead of
    * an eval-on-unevaluable crash; a Long literal is range-checked
    * rather than silently truncated. */
  private[graft] def intLiteral(what: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an integer literal, got non-foldable expression ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal in int range, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def macroFn(template: String) = sqlMacro(spark, template)

    reg.createOrReplaceTempFunction("decode_plc_words",
      exprs => DecodePlcWordsExpr(arity("decode_plc_words", 1, exprs).head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => { val e = arity("vec_dot", 2, exprs); VectorDotExpr(e(0), e(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("int8_pack",
      exprs => { val e = arity("int8_pack", 2, exprs); Int8PackExpr(e(0), e(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("int8_dot",
      exprs => { val e = arity("int8_dot", 2, exprs); Int8DotExpr(e(0), e(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("phash_blocks",
      exprs => {
        val e = arity("phash_blocks", 2, exprs)
        PhashExpr(e(0), intLiteral("phash_blocks nBits", e(1)))
      }, "scala_udf")
    reg.createOrReplaceTempFunction("band_keys",
      exprs => BandKeysExpr(arity("band_keys", 1, exprs).head), "scala_udf")
    reg.createOrReplaceTempFunction("nearest_cells",
      exprs => {
        val e = arity("nearest_cells", 4, exprs)
        NearestCellsExpr(e(0), e(1), e(2), intLiteral("nearest_cells p", e(3)))
      }, "scala_udf")
    reg.createOrReplaceTempFunction("span_fps",
      exprs => {
        val e = arity("span_fps", 3, exprs)
        SpanFingerprintsExpr(e(0), intLiteral("span_fps window", e(1)),
          intLiteral("span_fps stride", e(2)))
      }, "scala_udf")
    reg.createOrReplaceTempFunction("encode_plc_words", macroFn(
      s"""if(length(__a0) = 0, cast(array() as array<int>),
         | transform(sequence(0, cast(length($Padded) / 2 as int) - 1),
         |  i -> cast(ascii(substr($Padded, 1 + i * 2, 1))
         |          + ascii(substr($Padded, 2 + i * 2, 1)) * 256 as int)))""".stripMargin),
      "scala_udf")
    reg.createOrReplaceTempFunction("expand_alternatives", macroFn(
      """aggregate(split(__a0, ' '), array(''),
        |  (acc, t) -> flatten(transform(acc,
        |    a -> transform(split(t, '/'), alt -> concat(a, alt)))))""".stripMargin),
      "scala_udf")
    reg.createOrReplaceTempFunction("expand_block", macroFn(
      """transform(sequence(0, cast(__a1 as int) - 1),
        |  i -> concat(regexp_replace(__a0, '[0-9]', ''),
        |    cast(cast(regexp_replace(__a0, '[^0-9]', '') as bigint) + i as string)))""".stripMargin),
      "scala_udf")
    reg.createOrReplaceTempFunction("shift_of",
      macroFn("if(hour(__a0) between 8 and 15, 1, 2)"), "scala_udf")
    reg.createOrReplaceTempFunction("plan_date_of",
      macroFn("if(hour(__a0) >= 8, to_date(__a0), date_sub(to_date(__a0), 1))"), "scala_udf")
  }
}
