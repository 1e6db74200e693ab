package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection SIZE of two SORTED long arrays with distinct elements —
  * one two-pointer merge walk, zero allocation.
  *
  * `size(array_intersect(a, b))` builds a hash set and an output array per
  * ROW; on the PPJoin verification path that ran 620k times over ~55-element
  * sorted hash arrays and was the gate's dominant stage (r13 PlanDump:
  * 7.8 s of a 6.2 s-median gate's wall). The caller guarantees both inputs
  * are sorted ascending and duplicate-free (collect_set + sort_array), so
  * the count equals array_intersect's distinct-element semantics exactly.
  *
  * PRECONDITION (public SQL surface `graft_sorted_intersect` too): both
  * arrays must be sorted ascending with distinct elements, or the count is
  * silently wrong. Arrays that ADMIT null elements (containsNull=true) are
  * rejected at analysis time — a null element would unbox to 0L and corrupt
  * the merge; build inputs with collect_set/sort_array (null-free by
  * construction) or filter nulls before aggregating.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_sorted_intersect needs two array<bigint> children that cannot " +
        "contain null elements (inputs must be sorted ascending and " +
        s"distinct, e.g. sort_array(collect_set(x))); got " +
        s"${left.dataType.sql} and ${right.dataType.sql}" +
        (Seq(left, right).map(_.dataType).collectFirst {
          case ArrayType(LongType, true) =>
            " — an array admitting nulls would unbox null to 0 and return " +
              "a silently wrong count"
        }.getOrElse("")))
  }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.SortedLongIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
