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
  def vocabUnits(units: DataFrame, k: Int, maxPieceLen: Int = 4): DataFrame =
    vocabDistinct(distinctUnits(units), k, maxPieceLen)

  /** [[vocabUnits]] over an already-aggregated (unit, wct) frame. */
  private def vocabDistinct(du: DataFrame, k: Int,
      maxPieceLen: Int): DataFrame = {
    require(k >= 1, s"Unigram.vocabUnits: k must be >= 1, got $k")
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"Unigram.vocabUnits: maxPieceLen in [1,16], got $maxPieceLen")
    val grams = du
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
    encodeDistinct(distinctUnits(units), vocab)
  }

  private def encodeDistinct(du: DataFrame,
      vocab: Seq[(String, Long)]): DataFrame =
    du.withColumn("toks", call_function("graft_unigram", col("unit"),
      array(vocab.map(v => lit(v._1)): _*),
      array(vocab.map(v => lit(v._2)): _*)))

  /** Hard-EM (Viterbi-EM) unigram TRAINING — the re-estimation loop
    * that turns the closed-form seed into a model of how the corpus
    * actually segments (the hard-assignment variant of Kudo 2018 §3.2's
    * EM: Viterbi in place of full forward–backward expectations, the
    * same loop SentencePiece exposes as its Viterbi training mode).
    * Each round: (1) segment every DISTINCT unit under the current
    * (piece, ct) model; (2) RECOUNT — a piece's new count is its usage
    * in those segmentations, weighted by unit frequency; (3) pieces the
    * Viterbi never used DROP OUT (the seed's top-k holds many n-grams
    * the lattice never chooses — round 1 sheds them in bulk, later
    * rounds refine). Reachability is invariant without any alphabet
    * patching: every piece of round r's segmentations survives into
    * round r+1's vocabulary, so each unit always retains at least its
    * previous path.
    *
    * Returns the per-round ledger: (round, n_pieces, total_ct,
    * corpus_tokens, seg_min, seg_max) — `total_ct` (sum of recounted
    * piece counts) and `corpus_tokens` (sum of wct·|segmentation|) are
    * computed INDEPENDENTLY and must agree, pinning token conservation
    * through the recount; seg_min/seg_max pin the segmentations
    * themselves. Deterministic throughout, so the whole loop — seed
    * derivation, every lattice, every recount — replays exactly in SQL.
    *
    * Scale shape: each round is one lattice pass + one hash-aggregate
    * over DISTINCT units plus a vocabulary-sized collect (the model is
    * plan-sized metadata, shrinking monotonically); rounds are a small
    * constant. The corpus itself is touched once, at [[distinctUnits]]. */
  def trainUnits(units: DataFrame, k: Int, maxPieceLen: Int = 4,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"Unigram.trainUnits: rounds in [1,16], got $rounds")
    val spark = units.sparkSession
    import spark.implicits._
    val du = distinctUnits(units).localCheckpoint(true)
    try {
      var vocab: Seq[(String, Long)] =
        vocabDistinct(du, k, maxPieceLen)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          .sortBy(_._1)
      val ledger = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, String, String)]
      var r = 1
      while (r <= rounds) {
        // ONE job per round (r18): the global segmentation stats ride
        // the piece-count aggregation as observe() metrics over the
        // lattice rows — the pre-r18 shape checkpointed the lattice and
        // ran a separate global-agg action for the same numbers
        val obs = new org.apache.spark.sql.Observation()
        val enc = encodeDistinct(du, vocab)
          .withColumn("seg", concat_ws(" ", col("toks")))
          .observe(obs,
            sum(col("wct") * size(col("toks"))).as("corpus_tokens"),
            min(col("seg")).as("seg_min"),
            max(col("seg")).as("seg_max"))
        val next = enc
          .select(col("wct"), explode(col("toks")).as("piece"))
          .groupBy(col("piece")).agg(sum(col("wct")).as("ct"))
          .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
          .sortBy(_._1)
        ledger += ((r.toLong, next.length.toLong, next.map(_._2).sum,
          obs.get("corpus_tokens").asInstanceOf[Long],
          obs.get("seg_min").asInstanceOf[String],
          obs.get("seg_max").asInstanceOf[String]))
        vocab = next
        r += 1
      }
      ledger.toSeq.toDF("round", "n_pieces", "total_ct", "corpus_tokens",
        "seg_min", "seg_max")
    } finally du.unpersist()
  }
}
