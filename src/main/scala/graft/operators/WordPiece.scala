package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece-family subword tokenization (the BERT tokenizer shape:
  * greedy longest-match-first inference over a fixed vocabulary with
  * `##` continuation pieces — Devlin et al. 2019 §A.2), complementing
  * the BPE family in [[Bpe]]: BPE learns MERGES and encodes by replaying
  * them; WordPiece owns a VOCABULARY and encodes by maximal munch. For a
  * training-data pipeline this is the serving-side tokenizer — token
  * counting, sequence-length budgeting and cost estimation against a
  * fixed published vocab, without replaying a merge history.
  *
  * Scale shape (100 TB): both the vocabulary derivation and the encode
  * run over DISTINCT units (a corpus has billions of token occurrences
  * but a bounded unit set), so the heavy path is one hash-aggregate; the
  * vocabulary itself is top-k (plan-sized) and bakes into the encode
  * plan as a literal — no broadcast, no shuffle on the encode side, and
  * the per-unit greedy walk is a native codegen'd kernel
  * ([[graft.expressions.WordPieceEncode]]), not a UDF.
  *
  * Vocabulary derivation here is the CLOSED-FORM variant: top-k pieces
  * by corpus frequency over all n-grams (n ≤ maxPieceLen) of the units,
  * `##`-prefixed when interior — deterministic (ct DESC, piece ASC), one
  * aggregate, and exactly replayable in SQL (the oracle derives the same
  * vocab from the same corpus, so gate equality pins derivation AND
  * encode). Likelihood-scored iterative training (true WordPiece
  * induction) is the [[Bpe.mergesBatched]] loop with a different argmax;
  * the closed-form vocab is the scale-honest default — a single pass
  * where iterative training costs a driver round per merge. */
object WordPiece {

  /** Distinct whitespace-lowered words with corpus counts. */
  private def words(documents: DataFrame): DataFrame =
    documents
      .select(explode(TextFns.tokensWs(col("text"))).as("unit"))
      .groupBy(col("unit")).agg(count(lit(1)).as("wct"))

  private def distinctUnits(units: DataFrame): DataFrame =
    units.groupBy(col("unit")).agg(count(lit(1)).as("wct"))

  /** `##`-convention piece of `unit` at 1-based position `p`, length
    * `n`: raw at the word start, `##`-prefixed when interior. */
  private def pieceAt(unit: Column, p: Column, n: Column): Column =
    when(p === 1, unit.substr(p, n))
      .otherwise(concat(lit("##"), unit.substr(p, n)))

  /** Top-`k` vocabulary over ALL n-grams (1..maxPieceLen) of the unit
    * column, weighted by unit corpus frequency, `##` convention applied
    * by position. Deterministic order (ct DESC, piece ASC). Returns
    * (piece, ct) — k rows, bounded driver metadata when collected. */
  def vocabUnits(units: DataFrame, k: Int, maxPieceLen: Int = 4): DataFrame = {
    require(k >= 1, s"WordPiece.vocabUnits: k must be >= 1, got $k")
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"WordPiece.vocabUnits: maxPieceLen in [1,16], got $maxPieceLen")
    distinctUnits(units)
      .select(col("unit"), col("wct"),
        explode(sequence(lit(1), length(col("unit")))).as("p"))
      .select(col("unit"), col("wct"), col("p"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("unit")) - col("p") + lit(1))))
          .as("n"))
      .select(col("wct"),
        pieceAt(col("unit"), col("p"), col("n")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wct")).as("ct"))
      .orderBy(col("ct").desc, col("piece").asc)
      .limit(k)
  }

  /** [[vocabUnits]] over whitespace-lowered words of `documents.text`. */
  def vocab(documents: DataFrame, k: Int, maxPieceLen: Int = 4): DataFrame =
    vocabUnits(documents
      .select(explode(TextFns.tokensWs(col("text"))).as("unit")),
      k, maxPieceLen)

  /** Greedy longest-match encode of each DISTINCT unit against the
    * literal vocabulary: (unit, wct, toks array<string>). Unknown
    * positions emit `[UNK]` and advance one character (see
    * [[graft.expressions.WordPieceEncode]] for the policy note). */
  def encodeUnits(units: DataFrame, pieces: Seq[String]): DataFrame = {
    require(pieces.nonEmpty, "WordPiece.encodeUnits: empty vocabulary")
    distinctUnits(units)
      .withColumn("toks", call_function("graft_wordpiece", col("unit"),
        array(pieces.map(lit): _*)))
  }

  /** [[encodeUnits]] over whitespace-lowered words of `documents.text`. */
  def encodeWords(documents: DataFrame, pieces: Seq[String]): DataFrame =
    encodeUnits(documents
      .select(explode(TextFns.tokensWs(col("text"))).as("unit")), pieces)
}
