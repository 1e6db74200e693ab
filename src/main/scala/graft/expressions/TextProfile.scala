package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text quality profile: tokenize once, compute every cheap
  * pretraining-filter metric in one tight Scala loop.
  *
  * The composable-HOF formulation (TextFns.qualityScore + friends) is
  * semantically identical but re-tokenizes per metric and pays the
  * interpreted-HOF boxing cost per token (~0.8 ms/doc measured). This
  * expression is one virtual call per row (CodegenFallback) with plain
  * JVM string work inside — the per-token cost is gone.
  *
  * Metric definitions mirror TextFns exactly (same stopword list, same
  * Java \p{Punct} class, code-point lengths, same quality formula and
  * IEEE op order) so either path hash-matches the DuckDB oracle.
  */
case class TextProfile(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextProfile.schema
  override def prettyName: String = "graft_text_profile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val nChars = text.codePointCount(0, text.length).toLong

    var punct = 0L
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      if (cp < 128 && TextProfile.AsciiPunct(cp)) punct += 1
      ci += Character.charCount(cp)
    }

    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val n = toks.length.toLong
    var charSum = 0L
    var sw = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      charSum += t.codePointCount(0, t.length)
      if (TextProfile.Stopwords(t)) sw += 1
      i += 1
    }

    val meanTokLen = if (n == 0) 0.0 else charSum.toDouble / n
    val swRatio = if (n == 0) 0.0 else sw.toDouble / n
    val punctRatio = if (nChars == 0) 0.0 else punct.toDouble / nChars
    // identical op order to TextFns.qualityScore for bit parity
    val lenScore = math.min(nChars.toDouble / 500.0, 1.0)
    val quality = 0.4 * lenScore +
      0.3 * (1.0 - math.min(punctRatio * 5.0, 1.0)) +
      0.3 * math.min(swRatio * 5.0, 1.0)

    InternalRow(n, meanTokLen, swRatio, punctRatio, quality)
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

/** One-pass language ID: marker-word hits per language over the regex
  * tokenization, argmax with (hits, lang) lexicographic tie-break —
  * exactly TextFns.langId's array_max(struct(hits, lang)) semantics
  * (the marker lists sort so that lexicographic tie-break equals the
  * oracle's fixed CASE order). "und" when no marker fires. */
case class LangId(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.toLowerCase
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    var bestLang = "und"
    var bestHits = 0L
    LangId.Markers.foreach { case (lang, words) =>
      var hits = 0L
      var i = 0
      while (i < toks.length) { if (words(toks(i))) hits += 1; i += 1 }
      if (hits > bestHits || (hits == bestHits && hits > 0 && lang > bestLang)) {
        bestHits = hits; bestLang = lang
      }
    }
    UTF8String.fromString(bestLang)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  /** Same lists as TextFns.LangMarkers. */
  val Markers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "you", "that", "with"),
    "es" -> Set("el", "la", "de", "que", "los", "por", "con", "una"),
    "fr" -> Set("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "zh" -> Set("的", "是", "不", "我", "了", "在", "人", "有"))
}

object TextProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("mean_tok_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  /** Same list as TextFns.Stopwords. */
  val Stopwords: Set[String] =
    Set("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Java regex \p{Punct}: the 32 ASCII punctuation characters. */
  val AsciiPunct: Set[Int] =
    """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".map(_.toInt).toSet
}
