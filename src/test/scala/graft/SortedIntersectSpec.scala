package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** SortedLongIntersectCount must equal size(array_intersect) whenever its
  * contract holds (sorted ascending, distinct elements) — the PPJoin
  * verification path swaps one for the other. */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftColumnBridge.column(graft.expressions.SortedLongIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  test("parity with size(array_intersect) on random sorted distinct arrays") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 300).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      (arr(), arr())
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq.empty[Long], Seq.empty[Long])) :+
      ((Seq(Long.MinValue, -5L, 0L, Long.MaxValue), Seq(Long.MinValue, 0L, 7L, Long.MaxValue)))
    val out = rows.toDF("a", "b")
      .select(native(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("null arrays give null; wrong element type fails analysis") {
    val out = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b").select(native(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
    val ex = intercept[Exception] {
      Seq((Seq("x"), Seq("y"))).toDF("a", "b")
        .select(native(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("array<bigint>") ||
      ex.getMessage.contains("DATATYPE"), ex.getMessage)
  }

  test("arrays that ADMIT null elements are rejected at analysis time " +
    "(a null element would unbox to 0 and corrupt the merge)") {
    val df = Seq((Seq(Option(1L), Option(2L)), Seq(Option(1L))))
      .toDF("a", "b")
    assert(df.schema("a").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val ex = intercept[Exception] {
      df.select(native(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("null") || ex.getMessage.contains("DATATYPE"),
      ex.getMessage)
  }
}
