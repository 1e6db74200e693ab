package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword tokenization — the WordPiece
  * INFERENCE algorithm (BERT's serving-time tokenizer; Devlin et al.
  * 2019 §A.2, maximal munch over a fixed vocabulary): at each position
  * take the LONGEST vocabulary piece that matches, where a piece at the
  * word start is a raw string and an interior piece carries the `##`
  * continuation prefix. A position matching nothing emits `[UNK]` and
  * advances one character (per-position fallback; BERT's whole-word UNK
  * is a stricter policy — the per-position form keeps the behavior a
  * step-by-step replayable function of (word, vocab), which is what the
  * oracle pins).
  *
  * One JVM walk per word, vocabulary baked into the plan as a LITERAL
  * array (a tokenizer vocab is ~10⁴ strings — plan-sized, not
  * data-sized, so it ships with the serialized plan like a broadcast
  * without the broadcast machinery) and hashed ONCE per task via the
  * lazy encoder, not per row. Registered as SQL `graft_wordpiece(word,
  * array(...))`; codegen calls straight into the shared encoder — no
  * UDF, no boxing beyond the output array. */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "graft_wordpiece: empty vocabulary")

  override def prettyName: String = "graft_wordpiece"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val encoder = new WordPieceEncoder(vocab.toArray)

  override protected def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEncoder",
      new WordPieceEncoder(vocab.toArray),
      classOf[WordPieceEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-task kernel behind [[WordPieceEncode]]: vocabulary hashed
  * lazily on first row (once per task after deserialization), greedy
  * longest-match loop bounded by the longest raw piece. ASCII/BMP
  * precondition rides the corpus contract the other text kernels share
  * (UTF-16 substring == code-point substring on BMP text). */
class WordPieceEncoder(val vocab: Array[String]) extends Serializable {

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach { p =>
      if (p == null) throw new IllegalArgumentException(
        "graft_wordpiece: null vocabulary piece")
      // an empty-raw piece ("" or bare "##") would match every position
      // while advancing ZERO characters — an infinite loop, rejected
      // loudly (derived vocabularies never emit one; a hand-built vocab
      // could)
      if (p.isEmpty || p == "##") throw new IllegalArgumentException(
        s"graft_wordpiece: empty-raw vocabulary piece '$p'")
      s.add(p); ()
    }
    s
  }

  @transient private lazy val maxRaw: Int = {
    var m = 1
    vocab.foreach { p =>
      val l = if (p.startsWith("##")) p.length - 2 else p.length
      if (l > m) m = l
    }
    m
  }

  private val Unk = "[UNK]"

  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // the greedy scan walks UTF-16 units (substring, pos += 1 on [UNK]);
    // on non-BMP input that would split surrogate pairs and emit mangled
    // pieces SILENTLY, diverging from a code-point oracle. Reject loudly
    // (mirrors the '#'-free corpus guard) instead of guessing.
    var i = 0
    while (i < s.length) {
      if (Character.isSurrogate(s.charAt(i)))
        throw new IllegalArgumentException(
          "graft_wordpiece: input contains a non-BMP character (surrogate " +
            s"at index $i) — the encoder walks UTF-16 units and only " +
            "supports BMP text; pre-filter or transliterate the corpus")
      i += 1
    }
    val out = new java.util.ArrayList[Any](s.length)
    var pos = 0
    while (pos < s.length) {
      var l = math.min(maxRaw, s.length - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = s.substring(pos, pos + l)
        val key = if (pos == 0) cand else "##" + cand
        if (set.contains(key)) hit = key
        l -= 1
      }
      if (hit == null) {
        out.add(UTF8String.fromString(Unk))
        pos += 1
      } else {
        out.add(UTF8String.fromString(hit))
        pos += (if (pos == 0) hit.length else hit.length - 2)
      }
    }
    new GenericArrayData(out.toArray)
  }
}
