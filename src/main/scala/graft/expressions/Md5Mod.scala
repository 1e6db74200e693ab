package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native, codegen'd twin of the engine-portable md5-lower-64 hash family
  * (`HashFns.md5Lower64Mod`): little-endian low 64 bits of md5(utf8 bytes),
  * reduced mod `m` as UNSIGNED 64-bit arithmetic.
  *
  * Bit-identical to the Column composition
  * `pmod(conv(reversed-hex-of-md5-bytes-8..15, 16, 10).cast(decimal(20,0)),
  * m).cast(long)` — and to DuckDB's `md5_number_lower(x) % m` — but computed
  * straight from the digest bytes with one `Long.remainderUnsigned`,
  * skipping the hex-string slicing, base-16 string conversion and
  * BigDecimal modulo that made the column version ~20× more expensive per
  * call (the r13 PlanDump finding on `freq_cms_point`: 1.8M sketch-row
  * hashes dominated the gate). The hash VALUE is part of several gates'
  * oracle contracts; this changes only the evaluation path.
  */
case class Md5Mod(child: Expression, m: Long) extends UnaryExpression {
  require(m > 0, s"modulus must be positive, got $m")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft md5 mod needs a string child, got ${child.dataType.sql}")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Mod.hash(input.asInstanceOf[UTF8String], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Mod.hash($c, ${m}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Mod {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Little-endian long from md5 digest bytes 8..15, then unsigned mod. */
  def hash(s: UTF8String, m: Long): Long = {
    val d = digests.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var x = 0L
    var i = 15
    while (i >= 8) { x = (x << 8) | (bytes(i) & 0xffL); i -= 1 }
    java.lang.Long.remainderUnsigned(x, m)
  }
}
