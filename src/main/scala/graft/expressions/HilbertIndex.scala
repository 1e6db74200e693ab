package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Hilbert-curve index: maps a d-dimensional cell to its position along
  * the Hilbert space-filling curve (Skilling's transpose algorithm —
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — a
  * public-domain bit transform, then an MSB-first interleave of the
  * transposed coordinates).
  *
  * Same contract as [[ZValueInterleave]] (inputs masked to `bits`,
  * `n·bits ≤ 63`, null-in → null-out) and the same layout use: sort or
  * range-partition by the index before writing so every file covers a
  * compact hyper-rectangle. The difference is LOCALITY QUALITY: the
  * Hilbert curve takes unit steps only (consecutive indices are always
  * grid-adjacent), while Morton order takes long diagonal jumps at every
  * power-of-two boundary — so Hilbert tiles of equal row count have
  * tighter bounding boxes, which is why liquid-clustering layouts moved
  * from Morton to Hilbert. The cost is a slightly heavier per-row
  * transform (still branch-light long arithmetic inside whole-stage
  * codegen; both kernels are scan-side and pipeline-parallel, so at
  * 100 TB the extra ALU work is invisible next to the I/O it saves). */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression {

  private def n = children.length

  override def prettyName: String = "graft_hilbert"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    if (children.length < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs at least two columns (one-dimensional Hilbert " +
          "is the identity — use the column itself)")
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
    val coords = new Array[Long](n)
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      coords(j) = (v match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case i: Int => i.toLong
        case l: Long => l
      }) & mask
      j += 1
    }
    HilbertIndex.index(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val perChild = children.indices.map { j =>
      val e = evals(j)
      val assign = s"$arr[$j] = ((long) ${e.value}) & ${mask}L;"
      val body =
        if (children(j).nullable)
          s"""if (${e.isNull}) { ${ev.isNull} = true; } else { $assign }"""
        else assign
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
        |long[] $arr = new long[$n];
        |$perChild
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.expressions.HilbertIndex.index($arr, $bits);
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object HilbertIndex {

  /** Skilling transform + MSB-first interleave. `coords` is taken as
    * scratch (callers pass a fresh array); each element must already be
    * masked into [0, 2^bits). */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val m = 1L << (bits - 1)
    // inverse undo: from axes to transposed Hilbert coordinates
    var q = m
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((coords(i) & q) != 0L) coords(0) ^= p // invert low bits
        else { // exchange low bits of dim 0 and dim i
          val t = (coords(0) ^ coords(i)) & p
          coords(0) ^= t; coords(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { coords(i) ^= coords(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1L) { if ((coords(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { coords(i) ^= t; i += 1 }
    // the index is the MSB-first interleave of the transposed coords,
    // dimension 0 most significant within each bit row
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) {
        h = (h << 1) | ((coords(j) >> b) & 1L)
        j += 1
      }
      b -= 1
    }
    h
  }
}
