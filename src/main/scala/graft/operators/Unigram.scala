package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization (SentencePiece's unigram algorithm,
  * Kudo 2018) — the third tokenizer family, completing the trio: BPE
  * ([[Bpe]]) learns MERGES and replays them; WordPiece ([[WordPiece]])
  * owns a vocabulary and encodes by greedy maximal munch; Unigram owns
  * a vocabulary WITH PROBABILITIES and encodes by GLOBAL Viterbi — the
  * segmentation maximizing the product of piece probabilities, so a
  * locally-longest piece loses to a better whole segmentation (the
  * case greedy munch gets wrong by construction).
  *
  * Scale shape (100 TB): identical to WordPiece's DISTINCT-unit design
  * — derivation and encode cost one hash-aggregate over distinct units
  * (corpus occurrences collapse first), the vocabulary is top-k
  * plan-sized metadata baked into the encode plan as literal arrays,
  * and the per-unit lattice walk is a native codegen'd kernel
  * ([[graft.expressions.UnigramEncode]]), not a UDF.
  *
  * Probabilities are EXACT by construction: `p(piece) = ct / total`,
  * one IEEE double division of two sub-2^53 longs, and lattice scores
  * are fixed-order chains of correctly-rounded multiplies — so the
  * Viterbi argmax is bit-identical between the kernel and a SQL replay
  * (the same portability contract the WordPiece likelihood argmax
  * rides; no logarithms anywhere). */
object Unigram {

  private def distinctUnits(units: DataFrame): DataFrame =
    units.groupBy(col("unit")).agg(count(lit(1)).as("wct"))

  /** (piece, ct) vocabulary: top-`k` POSITIONLESS n-grams
    * (1..maxPieceLen — unigram pieces carry no `##` marker; a piece
    * scores the same anywhere in a unit) weighted by unit corpus
    * frequency, UNIONed with every single-character piece that missed
    * the top-k (the alphabet floor: with all single chars present,
    * every unit has a lattice path, so the encode can never strand).
    * Deterministic (ct DESC, piece ASC) and exactly replayable in SQL
    * — gate equality pins derivation AND encode. */
  def vocabUnits(units: DataFrame, k: Int, maxPieceLen: Int = 4): DataFrame = {
    require(k >= 1, s"Unigram.vocabUnits: k must be >= 1, got $k")
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"Unigram.vocabUnits: maxPieceLen in [1,16], got $maxPieceLen")
    val grams = distinctUnits(units)
      .select(col("unit"), col("wct"),
        explode(sequence(lit(1), length(col("unit")))).as("p"))
      .select(col("unit"), col("wct"), col("p"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("unit")) - col("p") + lit(1))))
          .as("n"))
      .select(col("unit").substr(col("p"), col("n")).as("piece"),
        col("wct"))
      .groupBy(col("piece")).agg(sum(col("wct")).as("ct"))
    val topk = grams.orderBy(col("ct").desc, col("piece").asc).limit(k)
    topk.unionByName(
      grams.filter(length(col("piece")) === 1)
        .join(topk.select(col("piece")), Seq("piece"), "left_anti"))
  }

  /** Viterbi encode of each DISTINCT unit against the literal
    * (piece, ct) vocabulary: (unit, wct, toks array<string>). The
    * vocabulary must cover the corpus alphabet ([[vocabUnits]]
    * guarantees it); an unreachable unit fails loudly in the kernel. */
  def encodeUnits(units: DataFrame, vocab: Seq[(String, Long)]): DataFrame = {
    require(vocab.nonEmpty, "Unigram.encodeUnits: empty vocabulary")
    distinctUnits(units)
      .withColumn("toks", call_function("graft_unigram", col("unit"),
        array(vocab.map(v => lit(v._1)): _*),
        array(vocab.map(v => lit(v._2)): _*)))
  }
}
