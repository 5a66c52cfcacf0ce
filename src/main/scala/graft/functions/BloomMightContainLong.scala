package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized Bloom filter of 64-bit keys.
  *
  * The filter arrives as plan-time bytes (built once with
  * `DataFrameStatFunctions.bloomFilter` — a tree-aggregated distributed
  * build) and is deserialized ONCE per executor into a codegen reference
  * object, so the probe inside whole-stage codegen is a direct
  * `mightContainLong` call — no UDF, no per-row deserialization, no
  * broadcast join. This is the fixed-size alternative to broadcasting a
  * benchmark n-gram SET: a 1M-entry / 1% filter is ~1.2 MB regardless of
  * string lengths, and stays ~MB-scale at benchmark sizes where the exact
  * set would no longer broadcast.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  require(bloomBytes.nonEmpty, "graft_bloom_contains: empty filter bytes")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects bigint, got ${t.sql}")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
