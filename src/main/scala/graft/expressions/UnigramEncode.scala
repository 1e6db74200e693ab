package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under a unigram language model — the THIRD
  * tokenizer family (SentencePiece's unigram algorithm, Kudo 2018 §3:
  * the segmentation maximizing the product of piece probabilities),
  * completing the induction trio next to frequency BPE and
  * likelihood-scored WordPiece. Unlike WordPiece's greedy maximal
  * munch, the unigram decode is GLOBAL: `dp[i] = max_j dp[j] ·
  * p(unit[j..i))`, so a locally-longest piece loses to a better whole
  * segmentation.
  *
  * Engine-portable exact argmax, no logs: every piece probability is
  * ONE IEEE double division of two sub-2^53 longs (`ct / total` —
  * bit-identical in any engine) and every lattice score is a chain of
  * correctly-rounded double multiplies in a fixed order (dp ascending,
  * start positions ascending), so scores — and therefore the argmax —
  * are bit-identical between this kernel and a SQL replay. Ties break
  * on the SMALLEST start position (longest last piece). Underflow is
  * structurally out of reach at the supported unit lengths (≤ ~100
  * pieces of p ≥ 1/2^53 each stays far above the double floor).
  *
  * Same plan shape as [[WordPieceEncode]]: vocabulary + counts baked
  * into the plan as LITERAL arrays (plan-sized, not data-sized), the
  * per-task kernel hashed once lazily, codegen calls straight into it —
  * no UDF. Registered as SQL `graft_unigram(unit, array(pieces...),
  * array(counts...))`. */
case class UnigramEncode(child: Expression, pieces: Seq[String],
    counts: Seq[Long]) extends UnaryExpression {

  require(pieces.nonEmpty, "graft_unigram: empty vocabulary")
  require(pieces.length == counts.length,
    s"graft_unigram: ${pieces.length} pieces vs ${counts.length} counts")

  override def prettyName: String = "graft_unigram"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val encoder =
    new UnigramEncoder(pieces.toArray, counts.toArray)

  override protected def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugEncoder",
      new UnigramEncoder(pieces.toArray, counts.toArray),
      classOf[UnigramEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-task kernel behind [[UnigramEncode]]: probabilities derived
  * lazily ONCE per task from the literal (piece, count) arrays — each
  * `ct / total` is a single exact-rounded division, matching a SQL
  * `CAST(ct AS DOUBLE) / CAST(total AS DOUBLE)` bit for bit — then one
  * Viterbi lattice walk per unit. BMP-only like the WordPiece kernel
  * (UTF-16 substring == code-point substring on BMP text); rejects
  * surrogates loudly. */
class UnigramEncoder(val pieces: Array[String], val counts: Array[Long])
    extends Serializable {

  @transient private lazy val probs: java.util.HashMap[String, java.lang.Double] = {
    var total = 0L
    var i = 0
    while (i < counts.length) {
      require(counts(i) > 0L,
        s"graft_unigram: non-positive count for piece '${pieces(i)}'")
      total += counts(i)
      i += 1
    }
    require(total < (1L << 53),
      s"graft_unigram: total count $total exceeds 2^53 — the exact-double " +
        "probability contract breaks; shard the vocabulary derivation")
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    i = 0
    while (i < pieces.length) {
      val p = pieces(i)
      if (p == null || p.isEmpty) throw new IllegalArgumentException(
        "graft_unigram: null/empty vocabulary piece")
      val prev = m.put(p, counts(i).toDouble / total.toDouble)
      if (prev != null) throw new IllegalArgumentException(
        s"graft_unigram: duplicate vocabulary piece '$p'")
      i += 1
    }
    m
  }

  @transient private lazy val maxLen: Int = {
    var m = 1
    pieces.foreach(p => if (p.length > m) m = p.length)
    m
  }

  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var i = 0
    while (i < n) {
      if (Character.isSurrogate(s.charAt(i)))
        throw new IllegalArgumentException(
          "graft_unigram: input contains a non-BMP character (surrogate " +
            s"at index $i) — the lattice walks UTF-16 units and only " +
            "supports BMP text; pre-filter or transliterate the corpus")
      i += 1
    }
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    dp(0) = 1.0
    i = 1
    while (i <= n) {
      var best = -1.0
      var bestJ = -1
      var j = math.max(0, i - maxLen)
      // j ascending with strict '>' keeps the SMALLEST start on ties —
      // the longest last piece, mirroring the oracle's (score DESC, j
      // ASC) window
      while (j < i) {
        if (dp(j) >= 0) {
          val p = probs.get(s.substring(j, i))
          if (p != null) {
            val cand = dp(j) * p.doubleValue()
            if (cand > best) { best = cand; bestJ = j }
          }
        }
        j += 1
      }
      dp(i) = best
      back(i) = bestJ
      i += 1
    }
    if (dp(n) < 0) throw new IllegalArgumentException(
      s"graft_unigram: unit '$s' is unreachable under the vocabulary — " +
        "include every corpus character as a single-char piece " +
        "(Unigram.vocabUnits does)")
    // backtrace: pieces come out last-first, reversed into reading order
    val rev = new java.util.ArrayList[Any](n)
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      rev.add(UTF8String.fromString(s.substring(j, pos)))
      pos = j
    }
    val out = new Array[Any](rev.size)
    var k = 0
    while (k < rev.size) {
      out(k) = rev.get(rev.size - 1 - k)
      k += 1
    }
    new GenericArrayData(out)
  }
}
