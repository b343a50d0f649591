package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership test over a long/int/string column —
  * the codegen upgrade of the Scala-UDF form the bloom operators
  * (q40_bloom_join, qd12_bloom_decontam) started with, and the same
  * shape Spark's internal `BloomFilterMightContain` gives its injected
  * runtime filters.
  *
  * Why an Expression and not a UDF: the membership test is the one
  * per-row step of a bloom prune, sitting in the probe side's scan
  * stage over EVERY corpus row — exactly the hot path where a Scala
  * UDF breaks whole-stage codegen (null-wrapper + boxing + function
  * dispatch per row). Here the filter object rides the codegen
  * references array (`addReferenceObj`) and the generated code is one
  * virtual call on an already-deserialized sketch.
  *
  * The filter is a constructor field, not a child expression: it is
  * driver-built (`df.stat.bloomFilter`) and bits-sized, so it
  * serializes with the expression tree like any literal.
  * `BloomFilter` is `Serializable`; executors deserialize it once per
  * task-set, not per row. Null inputs yield null (standard
  * null-propagating scalar semantics) — under a `Filter` that reads
  * as "dropped", matching the UDF form's knownnotnull wrapper.
  */
case class BloomMightContainExpr(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a long/int/string column, got ${t.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType    => filter.mightContainLong(v.asInstanceOf[Long])
    case IntegerType => filter.mightContainLong(v.asInstanceOf[Int].toLong)
    // mightContainString hashes the UTF-8 bytes — identical to hashing
    // the UTF8String's bytes directly, without the String round trip
    case StringType  => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case LongType    => s"${ev.value} = $bf.mightContainLong($v);"
      case IntegerType => s"${ev.value} = $bf.mightContainLong((long) $v);"
      case StringType  => s"${ev.value} = $bf.mightContainBinary($v.getBytes());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
