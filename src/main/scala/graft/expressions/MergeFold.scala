package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy left-to-right application of a SET of BPE merge rules — ONE
  * JVM walk of the symbol array per row, the merge-application kernel
  * of [[graft.operators.Bpe]] (Sennrich et al. 2016, arXiv:1508.07909).
  *
  * Replaces the Catalyst `aggregate` HOF fold that '|'-joined the
  * accumulator and re-`split` it: higher-order functions evaluate
  * INTERPRETED, per element, and the fold's matcher was `batchSize`
  * OR-terms of `endswith(concat("|", acc), ...)` — each term copying the
  * whole accumulated string per element, O(batch × |unit|²) character
  * traffic per row where this kernel does one hash probe per adjacent
  * pair. Semantics are exactly the fold's: walk symbols left to right
  * tracking the accumulated TAIL symbol; when some rule has lhs == tail
  * and rhs == next, grow the tail by rhs (the merged symbol becomes the
  * new tail — under [[graft.operators.Bpe.mergesBatchedUnits]]'s
  * triple-disjoint selection it can never re-match as lhs, so merges
  * never cascade in-batch); otherwise emit the tail and restart it at
  * next. Because the kernel compares WHOLE symbols (no separator
  * encoding), the fold tiers' historical no-'|' corpus precondition is
  * gone: a literal pipe is just a symbol, same as
  * [[graft.operators.Bpe.encodeTable]]. (The DuckDB oracle replays of
  * the fold still string-encode with '|' — the corpus-side no-pipe
  * guard stays THEIR precondition, asserted gate-side.)
  *
  * Rules are baked into the plan as a flat (lhs₁, rhs₁, lhs₂, rhs₂, …)
  * string-literal array — plan-sized (≤ 256 rules per batch), hashed
  * once per task via the lazy kernel, not per row. Registered as SQL
  * `graft_merge_fold(syms, array(...))`; codegen calls straight into
  * the shared kernel — no UDF, no boxing beyond the output array. */
case class MergeFold(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  require(rules.nonEmpty, "graft_merge_fold: empty rule set")
  require(rules.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "graft_merge_fold: empty-string merge operand")

  override def prettyName: String = "graft_merge_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val kernel = new MergeFoldKernel(
    rules.map(_._1).toArray, rules.map(_._2).toArray)

  override protected def nullSafeEval(input: Any): Any =
    kernel.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mergeFoldKernel",
      new MergeFoldKernel(rules.map(_._1).toArray, rules.map(_._2).toArray),
      classOf[MergeFoldKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.fold($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-task kernel behind [[MergeFold]]: rules hashed lazily on
  * first row (once per task after deserialization) into an rhs-keyed
  * map — matching probes by the NEXT symbol first (one hash lookup per
  * adjacent pair; most probes miss), then scans that rhs's (typically
  * single) lhs list. Null symbols are rejected loudly, mirroring
  * [[RunPairs]] — a silent skip would corrupt the conservation ledger. */
class MergeFoldKernel(lhs: Array[String], rhs: Array[String])
    extends Serializable {

  /** rhs → all lhs values that merge with it (1 entry in the common,
    * operand-disjoint case; small array keeps the miss path branchless). */
  @transient private lazy val byRhs: java.util.HashMap[UTF8String, Array[UTF8String]] = {
    val m = new java.util.HashMap[UTF8String, Array[UTF8String]](rhs.length * 2)
    var i = 0
    while (i < rhs.length) {
      val k = UTF8String.fromString(rhs(i))
      val v = UTF8String.fromString(lhs(i))
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(v) else prev :+ v)
      i += 1
    }
    m
  }

  def fold(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    def at(i: Int): UTF8String = {
      val s = syms.getUTF8String(i)
      if (s == null) throw new IllegalArgumentException(
        "graft_merge_fold: null symbol at index " + i +
          " — symbol arrays must be null-free (substr/split-built)")
      s
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n == 1) return new GenericArrayData(Array[Any](at(0).clone()))
    val lookup = byRhs
    // emitted strings are CLONED: getUTF8String hands back views into
    // the input buffer, which must not outlive the row's evaluation
    // (UTF8String.concat results are already fresh allocations)
    val out = new java.util.ArrayList[Any](n)
    var tail = at(0)
    var tailFresh = false // true iff `tail` is a concat result (owned)
    var i = 1
    while (i < n) {
      val x = at(i)
      val cands = lookup.get(x)
      var merged = false
      if (cands != null) {
        var j = 0
        while (!merged && j < cands.length) {
          if (cands(j).equals(tail)) merged = true
          j += 1
        }
      }
      if (merged) {
        tail = UTF8String.concat(tail, x)
        tailFresh = true
      } else {
        out.add(if (tailFresh) tail else tail.clone())
        tail = x
        tailFresh = false
      }
      i += 1
    }
    out.add(if (tailFresh) tail else tail.clone())
    new GenericArrayData(out.toArray)
  }
}
