package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** U1/F14: the reference's table function — `SplitFunction extends
  * TableFunction<Row>` used via `LATERAL TABLE(ik_analyze(fullword))`
  * (func/SplitFunction.java:12-27, dws/KeywordStatsApp.java:48-53) — as a
  * native Catalyst `Generator`, registered as SQL `graft_tokenize` so
  * `LATERAL VIEW graft_tokenize(text) t AS word` works verbatim.
  *
  * Tokenization matches TextFns.tokensWs (trim, lowercase, split on
  * whitespace runs) — the offline-safe stand-in for the IK segmenter. The
  * reference emits the whole input as one token when splitting fails
  * (SplitFunction.java:22-24); an empty/blank input here yields no rows,
  * which is that contract's sane limit case.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("word", StringType)))

  override def prettyName: String = "graft_tokenize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString.trim.toLowerCase
      if (s.isEmpty) Nil
      else s.split("\\s+").iterator.filter(_.nonEmpty)
        .map(w => InternalRow(UTF8String.fromString(w))).toSeq
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}
