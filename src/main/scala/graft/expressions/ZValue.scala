package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Z-order (Morton) interleave: bit i of column j lands at result bit
  * `i*N + j`, so rows close in EVERY dimension get close z-values — the
  * data-layout key behind multi-dimensional file skipping (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, and the classic UB-tree literature). Sorting a
  * table by z-value before writing gives each parquet file a tight
  * min/max envelope on ALL interleaved columns at once, where a linear
  * sort keys file pruning to its leading column only; at 100 TB the
  * difference is "scan 1% of files for a predicate on either column"
  * versus "scan everything for a predicate on the second one".
  *
  * Inputs are integral and are masked to the low `bits` bits — callers
  * normalize each dimension into [0, 2^bits) first (rank, quantile
  * bucket, or plain modulus); `n·bits ≤ 63` keeps the interleave inside
  * a non-negative long so z-value ORDER BY is the true Morton order.
  * Null in any dimension → null (sorts together under Spark's default
  * null ordering, which is exactly where unkeyed rows belong).
  *
  * Codegen emits one fixed-trip loop per column inside whole-stage
  * codegen — no boxing, no fallback — so the z-value computation rides
  * the write-side scan for free.
  */
case class ZValueInterleave(children: Seq[Expression], bits: Int)
    extends Expression {

  private def n = children.length

  override def prettyName: String = "graft_zvalue"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least one column")
    else if (!children.forall(c => integral.contains(c.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral columns, got " +
          children.map(_.dataType.catalogString).mkString(", "))
    else if (bits <= 0 || n * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs 0 < bits and columns*bits <= 63, got " +
          s"$n columns * $bits bits")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val mask: Long = (1L << bits) - 1L

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val long = v match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case i: Int => i.toLong
        case l: Long => l
      }
      val masked = long & mask
      var i = 0
      while (i < bits) {
        z |= ((masked >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val perChild = children.indices.map { j =>
      val e = evals(j)
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val compute =
        s"""long $v = ((long) ${e.value}) & ${mask}L;
           |for (int $i = 0; $i < $bits; $i++) {
           |  $z |= (($v >> $i) & 1L) << ($i * $n + $j);
           |}""".stripMargin
      val body =
        if (children(j).nullable)
          s"""if (${e.isNull}) { ${ev.isNull} = true; } else {
             |$compute
             |}""".stripMargin
        else compute
      s"""if (!${ev.isNull}) {
         |${e.code}
         |$body
         |}""".stripMargin
    }.mkString("\n")
    // ev.isNull is always a fresh variable name in Spark 4.x (never the
    // FalseLiteral), so it must be declared even when no child is nullable
    // or the generated code fails Janino compilation and silently falls
    // back to interpreted eval.
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long $z = 0L;
        |$perChild
        |long ${ev.value} = $z;
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
