package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Run-aware adjacent-pair extraction for BPE induction — ONE JVM walk
  * of the symbol array per row (the Bpe.mergesBatchedUnits pair-scan
  * kernel, reference analogue: the merge-pair counting of
  * arXiv:1508.07909 §3, made run-exact).
  *
  * Emits one struct per DISTINCT-symbol adjacency between consecutive
  * runs — (a, b, ct = 1, mct = 1) — and one per run of length L >= 2 —
  * (sym, sym, ct = L-1 naive adjacencies, mct = L/2 greedy-mergeable
  * occurrences, what the left-to-right fold actually merges). Summed
  * with the word weight downstream this gives BOTH counting views:
  * naive (the conservation identity Σct + W = symbols, and sequential
  * BPE's argmax ranking) and greedy-exact attribution for self-pairs.
  *
  * Semantically identical to the HOF formulation (starts/lengths/zip
  * over linear higher-order functions) it replaces in the hot loop:
  * HOFs evaluate interpreted, per-element, with boxing — measured ~3.4×
  * the adjacent-only scan per induction round on 128-symbol chunk
  * units; this kernel is a single allocation-light pass. PRECONDITION:
  * array elements must be non-null (vocab symbol arrays are built from
  * substr/split — null-free by construction); null-element arrays are
  * rejected at analysis time. */
case class RunPairs(child: Expression) extends UnaryExpression {

  // transform-built symbol arrays carry containsNull=true even though
  // substr/split never emit null elements — accepted, with a loud
  // runtime failure on an actual null (a silent skip would corrupt the
  // conservation identity)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_run_pairs needs array<string>, got ${t.sql}")
  }

  override def dataType: DataType = RunPairs.OutType

  override protected def nullSafeEval(input: Any): Any =
    RunPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RunPairs.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunPairs {
  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("ct", LongType, nullable = false),
    StructField("mct", LongType, nullable = false))), containsNull = false)

  /** One walk: track the current run (symbol, length); on each run
    * boundary emit the cross pair (prevRunSym, curSym, 1, 1); on run
    * close emit the self pair when the run held >= 2 symbols. Emitted
    * strings are CLONED — getUTF8String hands back views into the
    * input buffer, which must not outlive the row's evaluation. */
  def pairs(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](n)
    def at(i: Int): UTF8String = {
      val s = syms.getUTF8String(i)
      if (s == null) throw new IllegalArgumentException(
        "graft_run_pairs: null symbol at index " + i +
          " — symbol arrays must be null-free (substr/split-built)")
      s
    }
    var runSym = at(0)
    var runLen = 1
    def closeRun(): Unit =
      if (runLen >= 2) {
        val s = runSym.clone()
        out.add(InternalRow(s, s, (runLen - 1).toLong, (runLen / 2).toLong))
      }
    var i = 1
    while (i < n) {
      val s = at(i)
      if (s.equals(runSym)) runLen += 1
      else {
        closeRun()
        out.add(InternalRow(runSym.clone(), s.clone(), 1L, 1L))
        runSym = s
        runLen = 1
      }
      i += 1
    }
    closeRun()
    new GenericArrayData(out.toArray)
  }
}
