package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native Catalyst expression — the
  * codegen'd predicate behind `Joins.bloomPreFilteredJoin`.
  *
  * A Scala UDF here is an optimizer barrier: it breaks the whole-stage
  * codegen span over the fact scan and blocks pushdown past the filter.
  * This expression generates a direct `mightContainLong`/`mightContainBinary`
  * call inside the generated code (the `NfcNormalize` pattern), so the
  * pre-filter fuses into the scan stage it is supposed to cheapen.
  *
  * The filter object rides the expression via `addReferenceObj` — it is
  * serialized once into the stage's task binary (which Spark itself ships
  * by torrent broadcast), not per row or per task.
  *
  * Key-type contract (mirrors how `DataFrame.stat.bloomFilter` inserts):
  * integral build keys hash as longs, string keys as their UTF-8 bytes.
  * The caller casts integral probes to `bigint` BEFORE this expression;
  * `mightContainBinary(utf8.getBytes)` is bit-identical to the builder's
  * `putString` (both hash the UTF-8 byte run) without the per-row
  * `String` allocation `mightContainString` would cost.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName probes bigint or string keys, got ${other.catalogString}")
  }

  @transient private lazy val probeIsLong: Boolean = child.dataType == LongType

  override def nullSafeEval(input: Any): Any =
    if (probeIsLong) bloom.mightContainLong(input.asInstanceOf[Long])
    else bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    if (probeIsLong) defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
    else defineCodeGen(ctx, ev, c => s"$bf.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
